"""Deterministic synthetic transcript tables.

The canonical engine input (BASELINE.json ``input_hint``): Parquet of
multi-turn conversation/agent transcripts with columns
``conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us]``. Generated with a fixed seed, Zipf-ish
skewed conversation lengths (hot conversations exercise salting), and
a known set of injected violations so fixtures can assert exact
violation rows (FIXTURES.md §A).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = ["user", "assistant", "tool", "system"]

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu"
).split()

# marker words with multi-byte characters pin codepoint-vs-byte length
_UNICODE_WORDS = ["héllo", "wörld", "日本語", "données", "🙂ok"]

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

VALIDATION_SCHEMA = {
    "$schema": "http://json-schema.org/draft-04/schema#",
    "type": ["object"],
    "required": ["conv_id", "turn_idx", "role", "text", "ts"],
    "properties": {
        "conv_id": {"type": ["string"], "pattern": "^conv-[0-9]{8}$"},
        "turn_idx": {"type": ["integer"], "minimum": 0, "exclusiveMinimum": False},
        "role": {"type": ["string"], "enum": ROLES},
        "text": {"type": ["string"], "minLength": 1, "maxLength": 4000},
        "tool": {"type": ["null", "string"], "pattern": "^[a-z][a-z0-9-]*$"},
        "ts": {"type": ["string"], "format": "date-time"},
    },
}


def generate_transcripts(
    n_turns: int,
    seed: int = 42,
    violation_rate: float = 0.0,
) -> pa.Table:
    """Build a transcript table with ~n_turns rows.

    With ``violation_rate > 0`` a deterministic subset of rows gets a
    known violation (cycled through the FIXTURES.md §A injection
    list); the affected row indices and kinds are recoverable via
    :func:`injected_violations`.
    """
    rng = np.random.default_rng(seed)
    rows_conv, rows_idx, rows_role, rows_text, rows_tool, rows_ts = \
        [], [], [], [], [], []

    base_us = int(datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)
    conv = 0
    total = 0
    while total < n_turns:
        # Zipf-ish turn counts: mostly short, occasionally very long
        n = int(min(1 + rng.zipf(1.7), 200))
        cid = f"conv-{conv:08d}"
        t0 = base_us + conv * 60_000_000
        for i in range(n):
            role = ROLES[i % 4]
            nw = int(rng.integers(1, 60))
            words = [_WORDS[int(w)] for w in rng.integers(0, len(_WORDS), nw)]
            if i % 7 == 0:
                words.append(_UNICODE_WORDS[i % len(_UNICODE_WORDS)])
            rows_conv.append(cid)
            rows_idx.append(i)
            rows_role.append(role)
            rows_text.append(" ".join(words))
            rows_tool.append(f"tool-{int(rng.integers(0, 20))}" if role == "tool" else None)
            rows_ts.append(t0 + i * 1_000_000)
        conv += 1
        total += n

    table = pa.table({
        "conv_id": pa.array(rows_conv, pa.string()),
        "turn_idx": pa.array(rows_idx, pa.int32()),
        "role": pa.array(rows_role, pa.string()),
        "text": pa.array(rows_text, pa.string()),
        "tool": pa.array(rows_tool, pa.string()),
        "ts": pa.array(rows_ts, pa.timestamp("us")),
    })

    if violation_rate > 0:
        table = _inject_violations(table, violation_rate, seed)
    return table


_INJECTIONS = [
    "bad_role",        # enum violation
    "empty_text",      # min_length_failed
    "long_text",       # max_length_failed
    "negative_turn",   # min_failed
    "null_text",       # required_failed
    "bad_tool",        # pattern_failed
    "bad_conv_id",     # pattern_failed on conv_id
]


def _inject_violations(table: pa.Table, rate: float, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed + 1)
    n = table.num_rows
    n_bad = max(1, int(n * rate))
    idxs = np.sort(rng.choice(n, size=n_bad, replace=False))

    cols = {name: table[name].to_pylist() for name in table.column_names}
    for j, i in enumerate(idxs):
        kind = _INJECTIONS[j % len(_INJECTIONS)]
        i = int(i)
        if kind == "bad_role":
            cols["role"][i] = "narrator"
        elif kind == "empty_text":
            cols["text"][i] = ""
        elif kind == "long_text":
            cols["text"][i] = "x" * 4321
        elif kind == "negative_turn":
            cols["turn_idx"][i] = -1
        elif kind == "null_text":
            cols["text"][i] = None
        elif kind == "bad_tool":
            cols["tool"][i] = "BadTool!"
        elif kind == "bad_conv_id":
            cols["conv_id"][i] = "conversation-%d" % i
    out = pa.table({
        name: pa.array(cols[name], type=table.schema.field(name).type)
        for name in table.column_names
    })
    return out


def injected_violations(n_turns: int, seed: int = 42,
                        violation_rate: float = 0.0) -> list:
    """(row_index, kind) pairs for the injected violations, computed
    the same way as :func:`_inject_violations`."""
    base = generate_transcripts(n_turns, seed=seed, violation_rate=0.0)
    rng = np.random.default_rng(seed + 1)
    n = base.num_rows
    n_bad = max(1, int(n * violation_rate))
    idxs = np.sort(rng.choice(n, size=n_bad, replace=False))
    return [(int(i), _INJECTIONS[j % len(_INJECTIONS)])
            for j, i in enumerate(idxs)]


def write_transcripts(path: str, n_turns: int, seed: int = 42,
                      violation_rate: float = 0.0,
                      n_files: int = 1) -> str:
    """Write the table as one or more parquet files under ``path``
    (a directory for n_files > 1)."""
    import os

    table = generate_transcripts(n_turns, seed=seed, violation_rate=violation_rate)
    if n_files <= 1:
        if path.endswith(".parquet"):
            pq.write_table(table, path)
            return path
        os.makedirs(path, exist_ok=True)
        out = os.path.join(path, "part-00000.parquet")
        pq.write_table(table, out)
        return path
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    step = (n + n_files - 1) // n_files
    for f in range(n_files):
        chunk = table.slice(f * step, step)
        pq.write_table(chunk, os.path.join(path, f"part-{f:05d}.parquet"))
    return path
