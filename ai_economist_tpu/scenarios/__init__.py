"""Built-in scenarios (importing registers them; cf. reference
foundation/scenarios/__init__.py:7-11)."""

from ai_economist_tpu.scenarios import (  # noqa: F401
    covid19,
    layout_from_file,
    one_step_economy,
    wood_and_stone,
)
