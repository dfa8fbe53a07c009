from ai_economist_tpu.scenarios.covid19 import env  # noqa: F401
