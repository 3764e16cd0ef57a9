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
    base_us = int(datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)

    # Zipf-ish turn counts: mostly short, occasionally very long
    # (hot conversations exercise skew handling)
    sizes = np.minimum(1 + rng.zipf(1.7, size=n_turns), 200).astype(np.int64)
    cum = np.cumsum(sizes)
    n_convs = int(np.searchsorted(cum, n_turns) + 1)
    sizes = sizes[:n_convs]
    total = int(sizes.sum())

    conv_idx = np.repeat(np.arange(n_convs), sizes)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    turn_idx = np.arange(total) - np.repeat(starts, sizes)

    conv_names = np.array([f"conv-{c:08d}" for c in range(n_convs)],
                          dtype=object)
    roles = np.array(ROLES, dtype=object)[turn_idx % 4]

    # text: a deterministic pool of distinct seeded sentences (varied
    # lengths, periodic multi-byte markers to pin codepoint lengths)
    pool_size = min(max(total // 4, 256), 50_000)
    prng = np.random.default_rng(seed * 1_000_003)
    nws = prng.integers(1, 60, size=pool_size)
    flat = prng.integers(0, len(_WORDS), size=int(nws.sum()))
    word_arr = np.array(_WORDS, dtype=object)[flat]
    bounds = np.concatenate([[0], np.cumsum(nws)])
    pool = []
    for p in range(pool_size):
        words = word_arr[bounds[p]:bounds[p + 1]].tolist()
        if p % 7 == 0:
            words.append(_UNICODE_WORDS[p % len(_UNICODE_WORDS)])
        pool.append(" ".join(words))
    pool = np.array(pool, dtype=object)
    texts = pool[rng.integers(0, pool_size, size=total)]

    tool_names = np.array([f"tool-{k}" for k in range(20)], dtype=object)
    tools = np.where(roles == "tool",
                     tool_names[rng.integers(0, 20, size=total)], None)

    ts = (base_us + conv_idx * 60_000_000 + turn_idx * 1_000_000)

    # build in slices: a single string array over ~2GB of text would
    # overflow int32 offsets
    step = 4_000_000
    cols = {"conv_id": [], "turn_idx": [], "role": [], "text": [],
            "tool": [], "ts": []}
    for s in range(0, total, step):
        e = min(s + step, total)
        cols["conv_id"].append(pa.array(conv_names[conv_idx[s:e]], pa.string()))
        cols["turn_idx"].append(pa.array(turn_idx[s:e], pa.int32()))
        cols["role"].append(pa.array(roles[s:e], pa.string()))
        cols["text"].append(pa.array(texts[s:e], pa.string()))
        cols["tool"].append(pa.array(tools[s:e].tolist(), pa.string()))
        cols["ts"].append(pa.array(ts[s:e], pa.timestamp("us")))
    table = pa.table({k: pa.chunked_array(v) for k, v in cols.items()})

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
    kinds = np.array([_INJECTIONS[j % len(_INJECTIONS)]
                      for j in range(n_bad)], dtype=object)

    # vectorized scatter via pc.replace_with_mask — no python
    # round-trips of the full columns
    import pyarrow.compute as pc

    replacements = {
        "bad_role": ("role", lambda at: ["narrator"] * len(at)),
        "empty_text": ("text", lambda at: [""] * len(at)),
        "long_text": ("text", lambda at: ["x" * 4321] * len(at)),
        "null_text": ("text", lambda at: [None] * len(at)),
        "negative_turn": ("turn_idx", lambda at: [-1] * len(at)),
        "bad_tool": ("tool", lambda at: ["BadTool!"] * len(at)),
        "bad_conv_id": ("conv_id",
                        lambda at: [f"conversation-{i}" for i in at]),
    }
    # per column: collect (position, value) pairs across kinds
    per_col: dict = {}
    for kind, (name, make) in replacements.items():
        at = idxs[kinds == kind]
        if len(at) == 0:
            continue
        vals = make(at)
        per_col.setdefault(name, []).extend(zip(at.tolist(), vals))

    arrays = {name: table[name] for name in table.column_names}
    for name, pairs in per_col.items():
        pairs.sort(key=lambda p: p[0])
        positions = np.array([p[0] for p in pairs], dtype=np.int64)
        values = np.array([p[1] for p in pairs], dtype=object)
        col_type = table.schema.field(name).type
        # chunk-aware scatter (a combined >2GB string array would
        # overflow int32 offsets)
        new_chunks = []
        offset = 0
        for chunk in table[name].chunks:
            m = len(chunk)
            sel = (positions >= offset) & (positions < offset + m)
            if sel.any():
                mask = np.zeros(m, dtype=bool)
                mask[positions[sel] - offset] = True
                chunk = pc.replace_with_mask(
                    chunk, pa.array(mask),
                    pa.array(values[sel].tolist(), type=col_type))
            new_chunks.append(chunk)
            offset += m
        arrays[name] = pa.chunked_array(new_chunks)
    return pa.table(arrays)


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
