"""Search templates — the lang-mustache module.

The reference renders a Mustache template into a search request body
(``modules/lang-mustache/src/main/java/org/opensearch/script/mustache/
MustacheScriptEngine.java``, ``TransportSearchTemplateAction.java``: render
to JSON, then parse with SearchSourceBuilder). This implements the Mustache
subset those templates actually use:

- ``{{var}}`` / ``{{{var}}}`` — variable substitution (JSON output needs no
  HTML escaping, so both forms behave alike, matching the reference's
  JsonEscapingMustacheFactory behavior for values)
- ``{{#section}}...{{/section}}`` — truthy conditional or list iteration
  (``{{.}}`` is the list element)
- ``{{^section}}...{{/section}}`` — inverted (falsy) conditional
- ``{{#toJson}}var{{/toJson}}`` — the reference's CustomMustacheFactory
  ``toJson`` encoder: embeds the parameter as literal JSON

:func:`render_template` returns the rendered string;
:func:`render_search_template` parses it into the request-body dict for
:mod:`opensearch_ray.search.dsl`.
"""
from __future__ import annotations

import json
import re
from typing import Any, Dict


_TOJSON = re.compile(r"\{\{#toJson\}\}\s*([\w.]+)\s*\{\{/toJson\}\}")
_SECTION = re.compile(
    r"\{\{([#^])([\w.]+)\}\}(.*?)\{\{/\2\}\}", re.S)
_VAR3 = re.compile(r"\{\{\{\s*([\w.]+)\s*\}\}\}")
_VAR = re.compile(r"\{\{\s*([\w.]+)\s*\}\}")


def _lookup(params: Dict[str, Any], path: str):
    cur: Any = params
    for part in path.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return None
    return cur


def _render(src: str, params: Dict[str, Any]) -> str:
    src = _TOJSON.sub(
        lambda m: json.dumps(_lookup(params, m.group(1))), src)

    def do_section(m: re.Match) -> str:
        mode, name, inner = m.group(1), m.group(2), m.group(3)
        val = _lookup(params, name)
        truthy = bool(val) and val != []
        if mode == "^":
            return _render(inner, params) if not truthy else ""
        if not truthy:
            return ""
        if isinstance(val, list):
            out = []
            for item in val:
                scope = dict(params)
                if isinstance(item, dict):
                    scope.update(item)
                scope["."] = item
                out.append(_render(inner.replace("{{.}}", _tostr(item))
                                   if not isinstance(item, dict) else inner,
                                   scope))
            return "".join(out)
        scope = dict(params)
        if isinstance(val, dict):
            scope.update(val)
        return _render(inner, scope)

    src = _SECTION.sub(do_section, src)
    src = _VAR3.sub(lambda m: _tostr(_lookup(params, m.group(1))), src)
    return _VAR.sub(lambda m: _tostr(_lookup(params, m.group(1))), src)


def _tostr(v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (dict, list)):
        return json.dumps(v)
    return str(v)


def render_template(source: str, params: Dict[str, Any]) -> str:
    """Render a Mustache template string with ``params``."""
    return _render(source, dict(params))


def render_search_template(source: str, params: Dict[str, Any]) -> dict:
    """Render + parse into a ``_search`` request-body dict
    (TransportSearchTemplateAction.convert)."""
    return json.loads(render_template(source, params))


def msearch_template(searcher, requests, text_field: str = "text",
                     id_col: str = "doc_id") -> list:
    """`_msearch/template` (MultiSearchTemplateAction): render each
    (source, params) pair and execute the batch; one result frame per
    request, in request order."""
    from . import dsl
    return [dsl.execute_search(searcher,
                               render_search_template(src, params),
                               text_field=text_field, id_col=id_col)
            for src, params in requests]
