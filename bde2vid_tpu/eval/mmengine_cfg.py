"""Parse the mmengine python-config string embedded in BDE2VID checkpoints.

Reference: eval_models_seq.py:53-60 uses mmengine ``Config.fromstring`` on
``ckpt['meta']['cfg']`` and reads ``.model``. mmengine isn't a dependency
here; the embedded cfg is a python module source whose top-level assignments
build plain dicts, so a restricted ``exec`` recovers the same structure.
"""

from __future__ import annotations

from typing import Any, Dict


_SAFE_BUILTINS = {
    "dict": dict,
    "list": list,
    "tuple": tuple,
    "range": range,
    "len": len,
    "int": int,
    "float": float,
    "str": str,
    "bool": bool,
    "min": min,
    "max": max,
    "True": True,
    "False": False,
    "None": None,
}


def parse_embedded_cfg(cfg_text: str) -> Dict[str, Any]:
    """Execute the config source and return the ``model`` dict."""
    # ns doubles as globals AND locals (module-exec semantics): with separate
    # dicts, lambdas / comprehensions inside the config could not resolve
    # top-level config variables (they look free names up in globals only)
    ns: Dict[str, Any] = {"__builtins__": _SAFE_BUILTINS}
    exec(compile(cfg_text, "<embedded-cfg>", "exec"), ns)
    if "model" not in ns:
        raise ValueError("embedded config defines no 'model'")
    model = ns["model"]
    if not isinstance(model, dict):
        raise TypeError("'model' in embedded config is not a dict")
    return dict(model)
