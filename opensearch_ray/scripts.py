"""Stored scripts — the `_scripts/{id}` API surface.

Ref: PutStoredScriptRequest / GetStoredScriptRequest /
DeleteStoredScriptRequest (cluster-state stored scripts,
`rest-api-spec/api/{put,get,delete}_script.json`) and
`scripts_painless_execute.json` (run a script against test input).

Two langs, matching the repo's scripting stance (SURVEY §2.10):
- ``mustache``: template SOURCE strings, persisted as JSON next to the
  store path (search templates by id);
- ``python``: callables — the Painless stand-in — held in-memory only
  (code is not serialized; a cluster would register them at startup the
  way plugins register natives).

``execute`` is the `_scripts/painless/_execute` analogue: render a
mustache template with params, or call a python script on the params.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional


class ScriptStore:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._mustache: Dict[str, str] = {}
        self._python: Dict[str, Callable] = {}
        if path and os.path.exists(path):
            with open(path) as f:
                self._mustache = json.load(f)

    def _persist(self) -> None:
        if not self.path:
            return
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._mustache, f)
        os.replace(tmp, self.path)

    def put_script(self, script_id: str, source, lang: str = "mustache"
                   ) -> None:
        if lang == "mustache":
            if not isinstance(source, str):
                raise TypeError("mustache source must be a string")
            self._mustache[script_id] = source
            self._persist()
        elif lang == "python":
            if not callable(source):
                raise TypeError("python script must be callable")
            self._python[script_id] = source
        else:
            raise ValueError(f"unknown script lang: {lang}")

    def get_script(self, script_id: str) -> dict:
        if script_id in self._mustache:
            return {"lang": "mustache",
                    "source": self._mustache[script_id]}
        if script_id in self._python:
            return {"lang": "python", "source": self._python[script_id]}
        raise KeyError(script_id)

    def delete_script(self, script_id: str) -> bool:
        hit = False
        if script_id in self._mustache:
            del self._mustache[script_id]
            self._persist()
            hit = True
        if script_id in self._python:
            del self._python[script_id]
            hit = True
        return hit

    def execute(self, script_id: str, params: Optional[dict] = None) -> Any:
        """`_scripts/painless/_execute`: mustache renders, python calls."""
        s = self.get_script(script_id)
        params = params or {}
        if s["lang"] == "mustache":
            from .search.templates import render_template
            return render_template(s["source"], params)
        return s["source"](params)

    def render_search_template(self, script_id: str,
                               params: Optional[dict] = None) -> dict:
        """Stored search template by id (`_search/template` with
        ``{"id": ...}`` / `render_search_template.json`)."""
        s = self.get_script(script_id)
        if s["lang"] != "mustache":
            raise ValueError("search templates must be mustache")
        from .search.templates import render_search_template
        return render_search_template(s["source"], params or {})
