"""Externalized engine configuration (O5, SURVEY.md §2.1).

The reference externalizes source URLs and DB credentials through typed
``@ConfigurationProperties`` layered over properties files and env vars
(``NytimesBatchProcessorApplication.kt:210-212``,
``application.properties:1-8``, ``deploy/deploy.sh:18-22``). This is the
engine's equivalent: one frozen, typed config object resolved from
(lowest to highest precedence) built-in defaults -> a properties file ->
environment variables — so a deployment never edits code to retarget
data dirs, parallelism, or memory.

Scale notes: ``shuffle_partitions`` defaults to the core count locally;
on a cluster set it ~2-3x total executor cores via the same env/file
knobs. No credential ever lands in this file — like the reference, the
secret-bearing values arrive only through the environment.
"""

from __future__ import annotations

import os
from collections.abc import Mapping
from dataclasses import dataclass

ENV_PREFIX = "SPARK_GRAFT_"


def load_properties(path: str) -> dict[str, str]:
    """Parse a java-style ``key=value`` properties file (the reference's
    application.properties format): blank lines and '#' comments
    ignored, values may contain '='."""
    out: dict[str, str] = {}
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            key, sep, value = line.partition("=")
            if sep:
                out[key.strip()] = value.strip()
    return out


@dataclass(frozen=True)
class EngineConfig:
    """Typed engine settings. Fields mirror the knobs the reference
    externalized (sources, sink, runtime) plus the Spark-specific ones
    every deployment must own."""

    sf_dir: str = "/root/testdata/sf0.1"  # fixture/source data root
    cpus: int = 0  # 0 = auto (os.cpu_count)
    shuffle_partitions: int = 0  # 0 = match cpus
    driver_memory: str = "8g"
    target_dir: str = ""  # ingest sink root ('' = caller provides)
    checkpoint_dir: str = ""  # streaming checkpoint root

    @classmethod
    def resolve(
        cls,
        properties_file: str | None = None,
        env: Mapping[str, str] | None = None,
    ) -> "EngineConfig":
        """defaults < properties file < SPARK_GRAFT_* env vars."""
        env = os.environ if env is None else env
        layered: dict[str, str] = {}
        if properties_file is not None:
            layered.update(load_properties(properties_file))
        for field_name in cls.__dataclass_fields__:
            env_key = ENV_PREFIX + field_name.upper()
            if env_key in env:
                layered[field_name] = env[env_key]
        kwargs: dict[str, object] = {}
        for field_name, field in cls.__dataclass_fields__.items():
            if field_name not in layered:
                continue
            raw = layered[field_name]
            kwargs[field_name] = int(raw) if field.type == "int" else raw
        return cls(**kwargs)

    def effective_cpus(self) -> int:
        return self.cpus or os.cpu_count() or 4

    def effective_shuffle_partitions(self) -> int:
        return self.shuffle_partitions or max(self.effective_cpus(), 4)
