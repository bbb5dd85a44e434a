"""App configuration loader.

Parity: core/src/main/scala/Configuration.scala:11-35 — a JSON config
file holding either one properties object or a list of objects (merged
left-to-right) is loaded over a defaults map; every value is coerced
to string like the reference's ``.toString``; a lookup that has
neither a value nor a default raises. When no file is given, the
defaults ARE the values (`Configuration.apply(defaultValues)`); when a
file is given, the file's properties alone are the values and the
defaults only serve ``get_or_default`` fallback — mirroring the
reference exactly (it does NOT merge the two maps).

This is driver-side bootstrap control flow (SURVEY §3 EP1) — no Spark
plan and no oracle (COVERAGE.md dependency/driver-side policy); the
pipeline half of EP1 is :mod:`demy_spark.orchestrator`, whose ``Model``
resolves :class:`Cfg` step params through a ``Configuration``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Cfg:
    """Marker for a step param whose value comes from the app config:
    ``Step(params={"path": Cfg("storage.root")})`` resolves through
    ``Configuration.get_or_default`` at run time."""

    prop: str


@dataclass
class Configuration:
    values: dict[str, str] = field(default_factory=dict)
    default_values: dict[str, str] = field(default_factory=dict)

    def get(self, prop: str) -> str | None:
        return self.values.get(prop)

    def get_or_default(self, prop: str) -> str:
        if prop in self.values:
            return self.values[prop]
        if prop in self.default_values:
            return self.default_values[prop]
        raise KeyError(f"Cannot find value or default for property {prop}")


def _coerce(v: object) -> str:
    if isinstance(v, bool):  # JVM Boolean.toString is lowercase
        return "true" if v else "false"
    return str(v)


def load_config(
    path: str | None, defaults: dict[str, object] | None = None
) -> Configuration:
    """Load a JSON config file over ``defaults``; ``path=None`` means
    run on defaults alone (the reference's missing-FSNode branch)."""
    dflt = {str(k): _coerce(v) for k, v in (defaults or {}).items()}
    if path is None:
        return Configuration(values=dict(dflt), default_values=dflt)
    try:
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        raise ValueError(
            f"Cannot load configuration file {path} as json: {e}"
        ) from e
    if isinstance(data, list):
        values: dict[str, str] = {}
        for elem in data:
            if not isinstance(elem, dict):
                raise ValueError(f"cannot interpret configuration file {path}")
            values.update({str(k): _coerce(v) for k, v in elem.items()})
    elif isinstance(data, dict):
        values = {str(k): _coerce(v) for k, v in data.items()}
    else:
        raise ValueError(f"We found a problem loading {path}")
    return Configuration(values=values, default_values=dflt)
