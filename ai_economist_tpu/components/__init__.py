"""Built-in components (importing registers them; cf. reference
foundation/components/__init__.py:7-17)."""

from ai_economist_tpu.components import build, cda, move  # noqa: F401
