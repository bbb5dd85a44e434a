"""Application bootstrap: the reference's entry-point trait.

Parity: core/src/main/scala/Application.scala:6-56 — an application
declares default config values and a ``run(spark, configuration)``
body; ``main`` parses ``master=… appname=… config=…`` key=value args
(case-insensitive keys, malformed args print usage and abort), builds
the session, loads the JSON configuration over the defaults
(:mod:`demy_spark.config`, Configuration.scala:11-35) and invokes the
body. Driver-side control flow only — no oracle (COVERAGE.md
driver-side policy); together with ``config.load_config`` and
``orchestrator.Model(config=...)`` this closes SURVEY §3 EP1
end-to-end: CLI → session → configuration → pipeline.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

from demy_spark.config import Configuration, load_config
from demy_spark.session import get_spark

USAGE = """\
This application should be called as follows:
  demy-app master={master url} appname={appName} config={app config json}
"""


def parse_app_args(args: list[str]) -> dict[str, str] | None:
    """``key=value`` arg parsing (Application.scala:17-28): keys are
    lower-cased; unknown keys, missing '=' or empty sides mean usage
    (None). Only master / appname / config exist, like the reference."""
    out: dict[str, str] = {}
    for s in args:
        i = s.find("=")
        if i <= 0 or i == len(s) - 1:
            return None
        prop, value = s[:i].lower(), s[i + 1 :]
        if prop not in ("master", "appname", "config"):
            return None
        out[prop] = value
    return out


def run_application(
    run: Callable[[SparkSession, Configuration], object],
    args: list[str],
    *,
    default_conf_values: dict[str, object] | None = None,
    spark: SparkSession | None = None,
) -> object | None:
    """Bootstrap and invoke ``run`` (Application.scala:36-46). Returns
    ``run``'s result, or None after printing usage for malformed args.
    ``spark`` injects an existing session (tests, notebooks); without
    it the session factory applies the scale-sane defaults on top of
    the reference's plain appname/master handling."""
    parsed = parse_app_args(args)
    if parsed is None:
        print(USAGE)
        return None
    session = spark or get_spark(
        app_name=parsed.get("appname", "demy_spark"),
        master=parsed.get("master"),
    )
    configuration = load_config(
        parsed.get("config"), default_conf_values or {}
    )
    return run(session, configuration)
