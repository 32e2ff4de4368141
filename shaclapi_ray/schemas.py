"""Arrow schemas for the engine's tables.

Maps the reference's implicit queue-record shapes (SURVEY.md §1.1) onto
declared Arrow schemas:

- pages          ≙ the exploded solution-mapping stream
                   (/root/reference/shaclapi/multiprocessing/contactSource.py:15-25)
- verdicts       ≙ ValidationResultTransmitter.send records
                   (/root/reference/shaclapi/reduction/ValidationResultTransmitter.py:18-25)
- violations     ≙ the "report triples" of the simple output
                   (/root/reference/shaclapi/multiprocessing/functions.py:126-151)
"""

from __future__ import annotations

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

VERDICTS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("shape_id", pa.string()),
        ("valid", pa.bool_()),
        ("reason", pa.string()),
    ]
)

VIOLATIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("shape_id", pa.string()),
        ("constraint", pa.string()),
        ("offending_value", pa.string()),
    ]
)

LINKS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("target_url", pa.string()),
        ("host", pa.string()),
    ]
)
