"""Config reader (op S6) + typed config model.

The reference drives everything from two YAML files read by
``read_config`` (/root/reference/utils/helper.py:8-39,
/root/reference/configs/extract.yaml, configs/load.yaml). Same surface
here, with two engine-grade changes:

- the parsed dict is lifted into typed dataclasses (``RegionConfig``,
  ``ExtractConfig``, ``LoadConfig``) so a typo fails at load, not at
  task 3 of a 4-task DAG;
- PyYAML is optional (gated import): configs may also be JSON, and a
  minimal fallback parser handles exactly the reference's YAML subset
  (flat keys, one list-of-maps) when PyYAML is absent.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field


@dataclass
class RegionConfig:
    name: str
    id: str
    admins: list[str] = field(default_factory=list)
    schedule: str | None = None  # cron, orchestrator concern (op O1)


@dataclass
class ExtractConfig:
    regions: list[RegionConfig]
    ads_type: str = "jual"
    property_type: str = "rumah"
    num_pages: int = 20


@dataclass
class LoadConfig:
    stg_table: str = "stg_property_rumah"
    main_table: str = "property_rumah"
    unique_key: str = "link"
    batch_size: int = 500


def _parse_yaml_subset(text: str) -> dict:
    """Fallback parser for the reference's YAML shape: scalar keys at
    the top level plus one ``regions:`` list of flat maps. Quoted
    scalars, inline lists and comments supported; nothing else."""

    def scalar(raw: str):
        raw = raw.split("#", 1)[0].strip() if not raw.strip().startswith(("'", '"')) else raw.strip()
        if raw.startswith(("'", '"')):
            quote = raw[0]
            end = raw.rfind(quote)
            return raw[1:end]
        if raw.startswith("[") and raw.endswith("]"):
            inner = raw[1:-1].strip()
            return [scalar(p.strip()) for p in inner.split(",")] if inner else []
        try:
            return int(raw)
        except ValueError:
            return raw

    out: dict = {}
    current_list: list | None = None
    current_item: dict | None = None
    for line in text.splitlines():
        if not line.strip() or line.strip().startswith("#"):
            continue
        # dotted keys cover spark conf names (configs/cluster.yaml)
        m = re.match(r"^(\s*)(- )?([\w.]+):\s*(.*)$", line)
        if not m:
            continue
        indent, dash, key, rest = m.groups()
        if not indent and not dash:
            if rest.strip():
                out[key] = scalar(rest)
                current_list = None
            else:
                current_list = out.setdefault(key, [])
            current_item = None
        elif current_list is not None:
            if dash:
                current_item = {}
                current_list.append(current_item)
            if current_item is not None and rest.strip():
                current_item[key] = scalar(rest)
    return out


def read_config(path: str) -> dict:
    """YAML/JSON config file -> dict (op S6). Unlike the reference
    (which ``exit(1)``s, /root/reference/utils/helper.py:35-37), errors
    raise — the orchestrator owns retry/abort policy."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"Config file not found: {path}")
    with open(path) as f:
        text = f.read()
    if path.endswith(".json"):
        return json.loads(text)
    try:
        import yaml  # optional dependency

        return yaml.safe_load(text)
    except ImportError:
        return _parse_yaml_subset(text)


def extract_config(d: dict) -> ExtractConfig:
    return ExtractConfig(
        regions=[RegionConfig(**r) for r in d.get("regions", [])],
        ads_type=d.get("ads_type", "jual"),
        property_type=d.get("property_type", "rumah"),
        num_pages=int(d.get("num_pages", 20)),
    )


def load_config(d: dict) -> LoadConfig:
    return LoadConfig(
        stg_table=d.get("stg_table", "stg_property_rumah"),
        main_table=d.get("main_table", "property_rumah"),
        unique_key=d.get("unique_key", "link"),
        batch_size=int(d.get("batch_size", 500)),
    )
