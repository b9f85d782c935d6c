#!/usr/bin/env python3
"""Generate a test fixture with the REFERENCE implementation's exact
parquet schema (langchain_callback_parquet_logger/logger.py:22-29 —
timestamp[us, UTC] + six strings) and its exact payload envelope
(logger.py:168-187: event_type/timestamp/execution/data/raw; data fields
per handler, logger.py:252-307), so the interop spec can prove graft
reads reference-written logs drop-in.

Tooling-side only (pyarrow is a driver/tool dependency, never a library
one). Output is committed as a small test resource.
"""
import json
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

SCHEMA = pa.schema([
    ("timestamp", pa.timestamp("us", tz="UTC")),
    ("run_id", pa.string()),
    ("parent_run_id", pa.string()),
    ("custom_id", pa.string()),
    ("event_type", pa.string()),
    ("logger_metadata", pa.string()),
    ("payload", pa.string()),
])

META = json.dumps({"environment": "prod", "team": "data"})


def envelope(event_type, ts_iso, run_id, parent_run_id, custom_id, tags,
             data, raw=None):
    return json.dumps({
        "event_type": event_type,
        "timestamp": ts_iso,
        "execution": {
            "run_id": run_id,
            "parent_run_id": parent_run_id,
            "custom_id": custom_id,
            "tags": tags,
            "metadata": {},
        },
        "data": data,
        "raw": raw or {},
    })


T0 = 1736899200000000  # 2025-01-15T00:00:00Z in epoch micros
ISO = "2025-01-15T00:00:0{s}+00:00"

ROWS = [
    (T0, "run-1", "", "order-7", "llm_start", META,
     envelope("llm_start", ISO.format(s=0), "run-1", "", "order-7",
              ["custom_id:order-7"],
              {"prompts": ["Summarize the order"], "llm_type": "openai",
               "model": "gpt-x", "invocation_params": {"temperature": 0.1},
               "serialized": {"_type": "openai"}, "tools": []})),
    (T0 + 1000000, "run-1", "", "order-7", "llm_end", META,
     envelope("llm_end", ISO.format(s=1), "run-1", "", "order-7",
              ["custom_id:order-7"],
              {"response": {"generations": [[{"text": "Order summary..."}]]},
               "usage": {"prompt_tokens": 12, "completion_tokens": 34,
                         "total_tokens": 46},
               "model": "gpt-x"})),
    (T0 + 2000000, "run-2", "", "", "chain_start", META,
     envelope("chain_start", ISO.format(s=2), "run-2", "", "", [],
              {"inputs": {"q": "x"}})),
    (T0 + 3000000, "run-3", "run-2", "", "tool_start", META,
     envelope("tool_start", ISO.format(s=3), "run-3", "run-2", "", [],
              {"tool": "search", "input_str": "x"})),
    (T0 + 4000000, "run-3", "run-2", "", "tool_end", META,
     envelope("tool_end", ISO.format(s=4), "run-3", "run-2", "", [],
              {"output": "result"})),
]

out = pathlib.Path(__file__).resolve().parent.parent / \
    "src/test/resources/reference_logs/date=2025-01-15"
out.mkdir(parents=True, exist_ok=True)

table = pa.Table.from_arrays(
    [pa.array([r[i] for r in ROWS],
              type=SCHEMA.field(i).type) for i in range(len(SCHEMA))],
    schema=SCHEMA)
pq.write_table(table, out / "part-00000.parquet", compression="snappy")
print(f"wrote {len(ROWS)} rows to {out}")
