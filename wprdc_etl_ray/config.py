"""Settings-file config loader (reference parity: ``settings.json``
keyed by deployment section, read via ``Pipeline.get_config()`` —
wprdc-etl pipeline/pipeline.py; SURVEY.md §2.1 C6).

A settings file is JSON with named sections; a section maps directly
onto :class:`wprdc_etl_ray.pipelines.cdc.CDCConfig` fields plus the
engine-level paths:

```json
{
  "transcripts": {
    "table_root": "/data/transcripts",
    "wal_dir": "/data/transcripts-wal",
    "num_partitions": 256,
    "salt": 8,
    "strict": true
  }
}
```
"""

from __future__ import annotations

import json
import os
from dataclasses import fields

from .errors import InvalidConfigError
from .pipelines.cdc import CDCConfig


def get_config(settings_file: str, section: str) -> tuple[CDCConfig, dict]:
    """Load one section: returns (CDCConfig, extra) where ``extra`` holds
    non-config keys (paths etc.). Unknown typed keys raise
    InvalidConfigError (the reference fails fast on bad settings)."""
    if not os.path.exists(settings_file):
        raise InvalidConfigError(f"settings file not found: {settings_file}")
    with open(settings_file) as f:
        data = json.load(f)
    if section not in data:
        raise InvalidConfigError(
            f"section {section!r} not in {settings_file} (has {sorted(data)})"
        )
    raw = dict(data[section])
    cfg_fields = {f.name for f in fields(CDCConfig)}
    kwargs = {k: raw.pop(k) for k in list(raw) if k in cfg_fields}
    if "required" in kwargs:
        kwargs["required"] = tuple(kwargs["required"])
    try:
        cfg = CDCConfig(table_name=kwargs.pop("table_name", section), **kwargs)
    except TypeError as e:
        raise InvalidConfigError(str(e)) from e
    return cfg, raw
