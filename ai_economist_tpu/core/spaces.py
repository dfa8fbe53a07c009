"""Action-space metadata and single/multi-action encoding-decoding.

Replaces the reference's per-agent-object action bookkeeping
(ai_economist/foundation/base/base_agent.py:97-222, 407-438) with a static
`ActionLayout` built once per env; decoding a batch of integer actions into
per-subspace actions is pure vectorised arithmetic, traceable under jit.

Single-action mode (the default for mobile agents): one integer in
[0, total_actions]; 0 is the universal NO-OP and contiguous index ranges map
to each subspace in registration order (base_agent.py:108-114).

Multi-action mode (the default for the planner): a vector with one entry per
subspace, each in [0, n_sub] where 0 is that subspace's NO-OP
(base_agent.py:97-107).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class ActionLayout:
    """Static action layout for one agent class."""

    subspaces: Tuple[Tuple[str, int], ...]  # (name, n_actions_excluding_noop)
    multi_action_mode: bool

    @property
    def n_subspaces(self) -> int:
        return len(self.subspaces)

    @property
    def names(self) -> Tuple[str, ...]:
        return tuple(n for n, _ in self.subspaces)

    @property
    def total_actions(self) -> int:
        """Flat action-space size as exposed to a policy.

        Single mode: 1 + sum(n)  (base_agent.py:219-222).
        Multi mode: sum over subspaces of (n + 1)  (base_agent.py:214-218).
        """
        if self.multi_action_mode:
            return sum(n + 1 for _, n in self.subspaces)
        return 1 + sum(n for _, n in self.subspaces)

    @property
    def action_dims(self) -> Tuple[int, ...]:
        """Per-subspace sizes as a policy sees them (with NO-OP in multi mode)."""
        if self.multi_action_mode:
            return tuple(n + 1 for _, n in self.subspaces)
        return tuple(n for _, n in self.subspaces)

    def offsets(self) -> List[int]:
        """Start offset of each subspace within the flat single-mode index."""
        offs, acc = [], 0
        for _, n in self.subspaces:
            offs.append(acc)
            acc += n
        return offs

    def decode(self, actions: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Decode flat actions into {subspace_name: sub_action} (0 = NO-OP).

        Accepts shape [...] ints in single mode, or [..., n_subspaces] ints in
        multi mode. Sub-action k in a returned array corresponds to the
        reference's per-component action buffer value.
        """
        out: Dict[str, jnp.ndarray] = {}
        if self.multi_action_mode:
            for i, (name, _n) in enumerate(self.subspaces):
                out[name] = actions[..., i].astype(jnp.int32)
            return out
        a = actions.astype(jnp.int32)
        for (name, n), off in zip(self.subspaces, self.offsets()):
            within = (a > off) & (a <= off + n)
            out[name] = jnp.where(within, a - off, 0)
        return out

    def flatten_masks(self, mask_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Concatenate per-subspace masks into a flat policy mask.

        Reproduces base_agent.py:440-460 / base_env.py:724-745: single mode
        prepends one NO-OP bit; multi mode prepends a NO-OP bit per subspace.
        Masks may carry leading batch axes; concat is along the last axis.
        """
        parts = []
        some = next(iter(mask_dict.values()))
        ones = jnp.ones(some.shape[:-1] + (1,), jnp.float32)
        if not self.multi_action_mode:
            parts.append(ones)
        for name, _n in self.subspaces:
            if self.multi_action_mode:
                parts.append(ones)
            parts.append(mask_dict[name].astype(jnp.float32))
        if not parts:
            return ones
        return jnp.concatenate(parts, axis=-1)


def build_layouts(
    components,
    multi_action_mode_agents: bool,
    multi_action_mode_planner: bool,
) -> Dict[str, ActionLayout]:
    """Collect action subspaces from components in registration order.

    Components expose `n_actions(agent_cls_name)` returning None/0, an int, or
    a list of (sub_name, n) — matching the reference's
    BaseComponent.get_n_actions contract (base_component.py:158-196). Named
    subspaces are keyed "<Component>.<sub_name>" (base_agent.py:143-145).
    """
    layouts = {}
    for cls_name, multi in (
        ("BasicMobileAgent", multi_action_mode_agents),
        ("BasicPlanner", multi_action_mode_planner),
    ):
        subs: List[Tuple[str, int]] = []
        for comp in components:
            n = comp.n_actions(cls_name)
            if n is None or n == 0:
                continue
            if isinstance(n, int):
                subs.append((comp.name, n))
            else:
                for sub_name, n_ in n:
                    if n_ == 0:
                        continue
                    subs.append((f"{comp.name}.{sub_name}", n_))
        layouts[cls_name] = ActionLayout(tuple(subs), multi)
    return layouts
