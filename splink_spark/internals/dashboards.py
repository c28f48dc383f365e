"""Standalone-HTML dashboard emission for the interactive product surfaces.

The reference ships three offline HTML tools built from vendored JS bundles:
the cluster studio (reference internals/cluster_studio.py:1-436), the
comparison viewer (splink_comparison_viewer templates) and the clerical
labelling tool (internals/labelling_tool.py:1-129). The DATA halves already
exist in this engine (chart_data.cluster_studio_sample, the cv-distribution
DataFrame, labelling_tool_for_specific_record); this module renders them
into self-contained HTML pages. The pages are authored from scratch —
plain HTML + a from-scratch full-Vega force-directed spec — and load the
public Vega runtime from the jsdelivr CDN by default. Pass
``inline_js="/dir/with/bundles"`` to any render function to EMBED local
vega/vega-lite/vega-embed bundles instead (reference parity: its pages
inline vendored bundles and work air-gapped) — see
:mod:`splink_spark.internals.vega_assets`.

All inputs are already-sampled/bounded DataFrames: the collects here are
sample_size clusters' members, their intra-cluster edges, or one record's
candidate list.
"""

from __future__ import annotations

import json
from typing import Any, Mapping, Optional, Sequence

_PAGE = """<!DOCTYPE html>
<html>
<head>
  <meta charset="utf-8"/>
  <title>__TITLE__</title>
  __SCRIPTTAGS__
  <style>
    body { font-family: sans-serif; margin: 1.5em; }
    select { font-size: 1em; margin: 0 0 1em 0.5em; }
    table { border-collapse: collapse; font-size: 0.85em; margin-top: 1em; }
    th, td { border: 1px solid #ccc; padding: 2px 8px; text-align: left; }
    th { background: #f0f0f0; }
  </style>
</head>
<body>
<h2>__TITLE__</h2>
__BODY__
<script>
__SCRIPT__
</script>
</body>
</html>
"""


def _force_graph_spec(width: int = 600, height: int = 450) -> dict:
    """Full-Vega (not Vega-Lite — VL has no force transform) node-link spec:
    nodes laid out by the force simulation, edges as path marks linking the
    simulated positions, node tooltip carrying the record payload."""
    return {
        "$schema": "https://vega.github.io/schema/vega/v5.json",
        "width": width,
        "height": height,
        "padding": 0,
        "data": [
            {"name": "node-data"},
            {"name": "link-data"},
        ],
        "scales": [
            {
                "name": "color",
                "type": "ordinal",
                "domain": {"data": "node-data", "field": "cluster_id"},
                "range": {"scheme": "category20"},
            }
        ],
        "marks": [
            {
                "name": "nodes",
                "type": "symbol",
                "zindex": 1,
                "from": {"data": "node-data"},
                "encode": {
                    "enter": {
                        "fill": {"scale": "color", "field": "cluster_id"},
                        "size": {"value": 300},
                        "stroke": {"value": "white"},
                        "tooltip": {"signal": "datum"},
                    }
                },
                "transform": [
                    {
                        "type": "force",
                        "iterations": 300,
                        "static": True,
                        "forces": [
                            {"force": "center",
                             "x": {"signal": "width / 2"},
                             "y": {"signal": "height / 2"}},
                            {"force": "collide", "radius": 14},
                            {"force": "nbody", "strength": -40},
                            {"force": "link", "links": "link-data",
                             "id": "datum.id", "distance": 60},
                        ],
                    }
                ],
            },
            {
                "type": "path",
                "from": {"data": "link-data"},
                "interactive": False,
                "encode": {
                    "update": {
                        "stroke": {"value": "#888"},
                        "strokeWidth": {"field": "stroke_width"},
                        "tooltip": {"signal": "datum"},
                    }
                },
                "transform": [
                    {
                        "type": "linkpath",
                        "require": {"signal": "nodes"},
                        "shape": "line",
                        "sourceX": "datum.source.x",
                        "sourceY": "datum.source.y",
                        "targetX": "datum.target.x",
                        "targetY": "datum.target.y",
                    }
                ],
            },
        ],
    }


def render_cluster_studio_html(
    node_rows: Sequence[Mapping[str, Any]],
    edge_rows: Sequence[Mapping[str, Any]],
    unique_id_column_name: str = "unique_id",
    out_path: Optional[str] = None,
    title: str = "Cluster studio",
    inline_js: Optional[str] = None,
) -> str:
    """Self-contained cluster-studio page: a cluster selector, a
    force-directed node-link view of the selected cluster (edge width ∝
    match weight), and the member-record table. ``node_rows``/``edge_rows``
    are collected rows from
    :func:`~splink_spark.internals.chart_data.cluster_studio_sample`."""
    uid = unique_id_column_name
    nodes = [dict(r) for r in node_rows]
    edges = [dict(r) for r in edge_rows]
    clusters = sorted({str(n["cluster_id"]) for n in nodes})
    for n in nodes:
        n["id"] = str(n[uid])
        n["cluster_id"] = str(n["cluster_id"])
    for e in edges:
        e["source_id"] = str(e[f"{uid}_l"])
        e["target_id"] = str(e[f"{uid}_r"])
        e["cluster_id"] = str(e.get("cluster_id"))
        mw = e.get("match_weight")
        e["stroke_width"] = max(0.5, min(6.0, 1.0 + float(mw or 0) / 4.0))
    body = (
        '<label>Cluster: <select id="cluster-select"></select></label>\n'
        '<div id="graph"></div>\n<div id="members"></div>'
    )
    script = f"""
const NODES = {json.dumps(nodes)};
const EDGES = {json.dumps(edges)};
const CLUSTERS = {json.dumps(clusters)};
const SPEC = {json.dumps(_force_graph_spec())};
const sel = document.getElementById("cluster-select");
for (const c of CLUSTERS) {{
  const o = document.createElement("option"); o.value = c; o.text = c;
  sel.appendChild(o);
}}
function table(rows) {{
  if (!rows.length) return "";
  const cols = Object.keys(rows[0]);
  let h = "<table><tr>" + cols.map(c => `<th>${{c}}</th>`).join("") + "</tr>";
  for (const r of rows)
    h += "<tr>" + cols.map(c => `<td>${{r[c] ?? ""}}</td>`).join("") + "</tr>";
  return h + "</table>";
}}
function show(cid) {{
  const ns = NODES.filter(n => n.cluster_id === cid);
  const ids = new Set(ns.map(n => n.id));
  const es = EDGES.filter(e => ids.has(e.source_id) && ids.has(e.target_id))
    .map(e => ({{...e, source: e.source_id, target: e.target_id}}));
  const spec = JSON.parse(JSON.stringify(SPEC));
  spec.data[0].values = ns;
  spec.data[1].values = es;
  vegaEmbed("#graph", spec, {{actions: false}});
  document.getElementById("members").innerHTML = table(ns);
}}
sel.addEventListener("change", () => show(sel.value));
if (CLUSTERS.length) show(CLUSTERS[0]);
"""
    from .vega_assets import vega_script_tags

    html = (
        _PAGE.replace("__TITLE__", title)
        .replace(
            "__SCRIPTTAGS__",
            vega_script_tags(("vega", "vega-embed"), inline_js),
        )
        .replace("__BODY__", body)
        .replace("__SCRIPT__", script)
    )
    if out_path:
        with open(out_path, "w", encoding="utf-8") as f:
            f.write(html)
    return html


def render_comparison_viewer_html(
    distribution_rows: Sequence[Mapping[str, Any]],
    example_rows: Mapping[str, Sequence[Mapping[str, Any]]],
    out_path: Optional[str] = None,
    title: str = "Comparison viewer",
    inline_js: Optional[str] = None,
) -> str:
    """Comparison-viewer page: the comparison-vector-distribution bar chart
    (click a bar via the selector to see example scored pairs for that gamma
    pattern). ``example_rows`` maps gam_concat → collected example rows."""
    from .chart_specs import comparison_vector_distribution_spec

    spec = comparison_vector_distribution_spec(
        [dict(r) for r in distribution_rows]
    )
    body = (
        '<div id="dist"></div>\n'
        '<label>Pattern: <select id="pattern-select"></select></label>\n'
        '<div id="examples"></div>'
    )
    script = f"""
const SPEC = {json.dumps(dict(spec))};
const EXAMPLES = {json.dumps({k: [dict(r) for r in v] for k, v in example_rows.items()})};
vegaEmbed("#dist", SPEC, {{actions: false}});
const sel = document.getElementById("pattern-select");
for (const k of Object.keys(EXAMPLES)) {{
  const o = document.createElement("option"); o.value = k; o.text = k;
  sel.appendChild(o);
}}
function table(rows) {{
  if (!rows.length) return "<i>no examples</i>";
  const cols = Object.keys(rows[0]);
  let h = "<table><tr>" + cols.map(c => `<th>${{c}}</th>`).join("") + "</tr>";
  for (const r of rows)
    h += "<tr>" + cols.map(c => `<td>${{r[c] ?? ""}}</td>`).join("") + "</tr>";
  return h + "</table>";
}}
function show(k) {{ document.getElementById("examples").innerHTML = table(EXAMPLES[k] || []); }}
sel.addEventListener("change", () => show(sel.value));
const first = Object.keys(EXAMPLES)[0];
if (first) {{ sel.value = first; show(first); }}
"""
    # vega-embed renders vega-lite too when vega-lite is loaded; add it
    from .vega_assets import vega_script_tags

    html = (
        _PAGE.replace("__TITLE__", title)
        .replace(
            "__SCRIPTTAGS__",
            vega_script_tags(("vega", "vega-lite", "vega-embed"), inline_js),
        )
        .replace("__BODY__", body)
        .replace("__SCRIPT__", script)
    )
    if out_path:
        with open(out_path, "w", encoding="utf-8") as f:
            f.write(html)
    return html


def render_labelling_tool_html(
    candidate_rows: Sequence[Mapping[str, Any]],
    unique_id_column_name: str = "unique_id",
    out_path: Optional[str] = None,
    title: str = "Labelling tool",
    inline_js: Optional[str] = None,
) -> str:
    """Clerical-labelling page (reference labelling_tool.py): one row per
    candidate pair with match/not-match/uncertain radios and a download
    button exporting the labels as JSON (columns matching the pairwise
    labels table: unique_id_l, unique_id_r, clerical_match_score)."""
    uid = unique_id_column_name
    rows = [dict(r) for r in candidate_rows]
    body = '<div id="pairs"></div>\n<button id="dl">Download labels JSON</button>'
    script = f"""
const ROWS = {json.dumps(rows)};
const UID = {json.dumps(uid)};
const pairsDiv = document.getElementById("pairs");
const cols = ROWS.length ? Object.keys(ROWS[0]) : [];
let h = "<table><tr>" + cols.map(c => `<th>${{c}}</th>`).join("") +
        "<th>label</th></tr>";
ROWS.forEach((r, i) => {{
  h += "<tr>" + cols.map(c => `<td>${{r[c] ?? ""}}</td>`).join("") +
    `<td><label><input type="radio" name="lab${{i}}" value="1">match</label>
     <label><input type="radio" name="lab${{i}}" value="0">not</label>
     <label><input type="radio" name="lab${{i}}" value="0.5">unsure</label></td></tr>`;
}});
pairsDiv.innerHTML = h + "</table>";
document.getElementById("dl").addEventListener("click", () => {{
  const labels = [];
  ROWS.forEach((r, i) => {{
    const sel = document.querySelector(`input[name="lab${{i}}"]:checked`);
    if (sel) labels.push({{
      unique_id_l: r[UID + "_l"], unique_id_r: r[UID + "_r"],
      clerical_match_score: parseFloat(sel.value),
    }});
  }});
  const blob = new Blob([JSON.stringify(labels, null, 2)],
                        {{type: "application/json"}});
  const a = document.createElement("a");
  a.href = URL.createObjectURL(blob);
  a.download = "labels.json";
  a.click();
}});
"""
    from .vega_assets import vega_script_tags

    html = (
        _PAGE.replace("__TITLE__", title)
        .replace(
            "__SCRIPTTAGS__",
            vega_script_tags(("vega", "vega-embed"), inline_js),
        )
        .replace("__BODY__", body)
        .replace("__SCRIPT__", script)
    )
    if out_path:
        with open(out_path, "w", encoding="utf-8") as f:
            f.write(html)
    return html
