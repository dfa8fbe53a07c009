"""Plugin registry for scenarios, components, entities, and agent types.

TPU-native analog of the reference's name->class registry
(reference: ai_economist/foundation/base/registrar.py:8-103). Names are
case-insensitive. Registered classes must subclass the registry's base class.
"""

from __future__ import annotations

from typing import Dict, List, Type


class Registry:
    """Case-insensitive name -> class registry with a base-class constraint."""

    def __init__(self, base_cls: type = object):
        self._base = base_cls
        self._entries: Dict[str, type] = {}
        self._display_names: List[str] = []

    def add(self, cls: type) -> type:
        """Class decorator: register `cls` under `cls.name`."""
        name = getattr(cls, "name", None)
        assert isinstance(name, str) and name, (
            f"{cls} must define a non-empty string attribute `name`"
        )
        assert issubclass(cls, self._base), (
            f"{cls} must subclass {self._base} to join this registry"
        )
        key = name.lower()
        if key in self._entries and self._entries[key] is not cls:
            raise KeyError(f"A different class is already registered under {name!r}")
        if key not in self._entries:
            self._display_names.append(name)
        self._entries[key] = cls
        return cls

    def get(self, name: str) -> type:
        key = str(name).lower()
        if key not in self._entries:
            raise KeyError(
                f"{name!r} is not registered. Registered entries: {self._display_names}"
            )
        return self._entries[key]

    def has(self, name: str) -> bool:
        return str(name).lower() in self._entries

    @property
    def entries(self) -> List[str]:
        return list(self._display_names)
