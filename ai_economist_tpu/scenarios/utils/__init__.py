from ai_economist_tpu.scenarios.utils import rewards, social_metrics  # noqa: F401
