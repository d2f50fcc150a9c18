"""Three-tier config system.

Semantics match the reference (main_utils.py:39-42,94-97 and
run_nudity.py:533-625): a JSON base config is read first and used as
argparse *defaults*, CLI flags override it, and a separate repellency
"task YAML" (``--task_config``) carries ``repellency.{method,n_embed,params.*}``
and ``data.{name,root,class_info}`` blocks.
"""

from __future__ import annotations

import json
from typing import Any, Mapping

import yaml


def read_json(filename: str) -> Mapping[str, Any]:
    """Return a Python dict of the JSON object at ``filename``.

    Reference parity: main_utils.py:39-42.
    """
    with open(filename) as fp:
        return json.load(fp)


def load_yaml(file_path: str) -> dict:
    """Load a task-config YAML. Reference parity: main_utils.py:94-97."""
    with open(file_path) as f:
        return yaml.load(f, Loader=yaml.FullLoader)


def save_combined_config(args, file_path: str, task_config: dict | None = None) -> None:
    """Dump merged argparse args + task config to YAML.

    Reference parity: main_utils.py:74-89 (task_config keys win on clash).
    Non-serializable arg values are stringified so the dump never fails.
    """
    args_dict = {arg: _yamlable(getattr(args, arg)) for arg in vars(args)}
    combined = {**args_dict, **task_config} if task_config is not None else args_dict
    with open(file_path, "w") as f:
        yaml.dump(combined, f, default_flow_style=False)
    print(f"Combined configuration saved to {file_path}")


def _yamlable(v):
    if isinstance(v, (str, int, float, bool, type(None), list, dict, tuple)):
        return v
    return str(v)
