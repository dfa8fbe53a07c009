"""Built-in components (importing registers them; cf. reference
foundation/components/__init__.py:7-17)."""

from ai_economist_tpu.components import (  # noqa: F401
    build,
    cda,
    covid19,
    move,
    redistribution,
    simple_labor,
)
