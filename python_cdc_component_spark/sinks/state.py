"""Resumable run state (K5).

Parity target: reference ``ex_mysql_cdc/src/component.py:490-509``
(``_write_result_state``): last offset (base64-wrapped), last schema per
table, last synced tables. The Spark rebuild keeps the same shape —
offsets become the last consumed ``(kbc__event_timestamp, kbc__file,
kbc__pos)`` watermark per table — and stores it as one JSON doc beside
the Structured Streaming checkpoint.
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass, field


@dataclass
class RunState:
    offsets: dict = field(default_factory=dict)        # table → {ts, file, pos}
    last_schema: dict = field(default_factory=dict)    # table → schema json
    last_synced_tables: list = field(default_factory=list)
    previous_mode: str | None = None                   # APPEND | DEDUPE

    def to_doc(self) -> dict:
        # Offsets round-trip through base64 like the reference state file
        # (component.py:292-305 reconstructs them the same way).
        return {
            "offset_b64": base64.b64encode(
                json.dumps(self.offsets, sort_keys=True).encode()).decode(),
            "last_schema": self.last_schema,
            "last_synced_tables": sorted(self.last_synced_tables),
            "previous_mode": self.previous_mode,
        }

    @classmethod
    def from_doc(cls, doc: dict) -> "RunState":
        offsets = {}
        if doc.get("offset_b64"):
            offsets = json.loads(base64.b64decode(doc["offset_b64"]).decode())
        return cls(offsets=offsets,
                   last_schema=doc.get("last_schema", {}),
                   last_synced_tables=list(doc.get("last_synced_tables", [])),
                   previous_mode=doc.get("previous_mode"))

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(self.to_doc(), fh, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path: str) -> "RunState":
        with open(path) as fh:
            return cls.from_doc(json.load(fh))

    @property
    def is_initial_run(self) -> bool:
        """Empty offsets → initial load; DEDUPE on an empty state takes the
        single-pass path (reference DebeziumKBCWrapper.java:86-106 T9)."""
        return not self.offsets
