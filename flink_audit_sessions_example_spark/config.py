"""Config plumbing — Java-properties files, reference-compatible.

The reference drives everything from a properties file
(``ParameterTool.fromPropertiesFile``, ``App.java:141``) with keys described
in ``readme.md:5-13``; all ``kafka.``-prefixed keys are forwarded verbatim
to the Kafka producer (``App.java:112-124``). Spark's Kafka connector
conveniently uses the same ``kafka.`` option prefix, so the pass-through is
a dict copy.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path


def load_properties(path: str | Path) -> dict[str, str]:
    """Parse a Java ``.properties`` file into a dict.

    Supports the subset the reference relies on: ``key=value`` lines,
    ``#``/``!`` comments, blank lines, and surrounding whitespace. (Parity
    with ``ParameterTool.fromPropertiesFile`` at ``App.java:141``.)
    """
    props: dict[str, str] = {}
    for raw in Path(path).read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "!")):
            continue
        for sep in ("=", ":"):
            if sep in line:
                key, _, value = line.partition(sep)
                props[key.strip()] = value.strip()
                break
    return props


@dataclass
class AppConfig:
    """The reference's config surface (``App.java:23-28``, ``readme.md:5-13``)."""

    audit_path: str
    audit_poll_seconds: int = 240
    audit_min_date: str | None = None  # YYYYMMDD (BASIC_ISO_DATE)
    session_gap_seconds: int = 600
    session_output: str = "kafka"  # "kafka" | "print" (reference default
    # is kafka: ``params.get(PARAM_SESSION_OUTPUT, "kafka")``, App.java:150)
    kafka_topic: str | None = None
    kafka_options: dict[str, str] = field(default_factory=dict)
    watermark_delay: str = "2 days"  # hard-coded in the reference, App.java:57
    #: Spark addition (no reference analog — Flink savepoints are cluster
    #: config): streaming checkpoint location, key ``session.checkpoint``.
    checkpoint_dir: str | None = None

    @classmethod
    def from_properties(cls, props: dict[str, str]) -> "AppConfig":
        kafka_options = {
            k: v
            for k, v in props.items()
            if k.startswith("kafka.") and k != "kafka.topic"
        }
        return cls(
            audit_path=props["audit.path"],
            audit_poll_seconds=int(props.get("audit.poll", "240")),
            audit_min_date=props.get("audit.min_date"),
            session_gap_seconds=int(props.get("session.duration", "600")),
            session_output=props.get("session.output", "kafka"),
            kafka_topic=props.get("kafka.topic"),
            kafka_options=kafka_options,
            checkpoint_dir=props.get("session.checkpoint"),
        )

    @classmethod
    def from_properties_file(cls, path: str | Path) -> "AppConfig":
        return cls.from_properties(load_properties(path))
