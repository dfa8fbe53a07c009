"""Entity definitions: resources, landmarks, endogenous quantities.

Mirrors the reference entity taxonomy (ai_economist/foundation/entities/
resources.py:13-64, landmarks.py:13-88, endogenous.py:11-36) but entities here
are *static metadata only* — all state lives in the EnvState pytree as dense
arrays, one [H, W] channel per spatial entity.

Landmark classification (reference landmarks.py:37-49):
  blocking = solid and not ownable   -> no agent may enter
  private  = solid and ownable       -> only the owning agent may enter
  public   = not solid, not ownable  -> anyone may enter
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

from ai_economist_tpu.core.registry import Registry


@dataclass(frozen=True)
class Resource:
    name: str = ""
    color: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    collectible: bool = False


@dataclass(frozen=True)
class Landmark:
    name: str = ""
    color: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    ownable: bool = False
    solid: bool = True

    @property
    def blocking(self) -> bool:
        return self.solid and not self.ownable

    @property
    def private(self) -> bool:
        return self.solid and self.ownable

    @property
    def public(self) -> bool:
        return (not self.solid) and (not self.ownable)


@dataclass(frozen=True)
class Endogenous:
    name: str = ""


class _InstanceRegistry(Registry):
    """Registry holding singleton entity *instances* (entities are pure data)."""

    def add(self, obj):  # type: ignore[override]
        name = obj.name
        assert isinstance(name, str) and name
        key = name.lower()
        if key not in self._entries:
            self._display_names.append(name)
        self._entries[key] = obj
        return obj


resource_registry = _InstanceRegistry()
landmark_registry = _InstanceRegistry()
endogenous_registry = _InstanceRegistry()

# --- Built-in resources (reference resources.py:40-64) ---
resource_registry.add(Resource("Wood", (107 / 255, 143 / 255, 113 / 255), True))
resource_registry.add(Resource("Stone", (241 / 255, 233 / 255, 219 / 255), True))
resource_registry.add(Resource("Coin", (229 / 255, 211 / 255, 82 / 255), False))

# --- Built-in landmarks (reference landmarks.py:52-88) ---
# A SourceBlock landmark exists per collectible resource (public, non-solid).
for _rname in ("Wood", "Stone"):
    _r = resource_registry.get(_rname)
    landmark_registry.add(
        Landmark(f"{_r.name}SourceBlock", _r.color, ownable=False, solid=False)
    )
landmark_registry.add(
    Landmark("House", (220 / 255, 20 / 255, 220 / 255), ownable=True, solid=True)
)
landmark_registry.add(
    Landmark("Water", (50 / 255, 50 / 255, 250 / 255), ownable=False, solid=True)
)

# --- Built-in endogenous (reference endogenous.py:29-36) ---
endogenous_registry.add(Endogenous("Labor"))


def register_resource(name, color=(0.5, 0.5, 0.5), collectible=False):
    """Register a new resource; creates the matching SourceBlock if collectible."""
    r = Resource(name, tuple(color), bool(collectible))
    resource_registry.add(r)
    if r.collectible:
        landmark_registry.add(
            Landmark(f"{name}SourceBlock", tuple(color), ownable=False, solid=False)
        )
    return r
