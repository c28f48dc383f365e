"""Vega-Lite spec emission (internals/chart_specs.py) — mirrors the
reference's tests/test_charts.py smoke matrix (fit a small model, render
every chart) plus structural validation: every spec declares the v5
schema, is JSON-serializable, and every encoded field exists in the
embedded data (or is derived by a transform/param)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

import splink_spark.internals.comparison_library as cl
from splink_spark import Linker, SettingsCreator, block_on
from splink_spark.internals.chart_specs import VEGA_LITE_SCHEMA, ChartSpec


def _set(comp, mus):
    for lv in comp.comparison_levels:
        if not lv.is_null_level:
            lv.m_probability, lv.u_probability = mus[lv.comparison_vector_value]
    return comp


def _encoded_fields(enc: dict) -> set:
    out = set()
    for channel, spec in enc.items():
        if isinstance(spec, dict):
            if "field" in spec:
                out.add(spec["field"])
            if channel == "tooltip":
                continue
        if channel == "tooltip" and isinstance(spec, list):
            out |= {t["field"] for t in spec if isinstance(t, dict) and "field" in t}
        if isinstance(spec, dict) and isinstance(spec.get("sort"), dict):
            if "field" in spec["sort"]:
                out.add(spec["sort"]["field"])
    return out


def validate_spec(spec):
    """Structural Vega-Lite check: schema header, embedded data, a view
    composition (mark/layer/facet), and no encoding referencing a field
    absent from every data row."""
    assert isinstance(spec, ChartSpec)
    assert spec["$schema"] == VEGA_LITE_SCHEMA
    values = spec["data"]["values"]
    assert isinstance(values, list)
    json.dumps(spec)  # round-trippable — no Spark/Column objects leaked in

    def walk(node, derived):
        """Yield (mark-unit, derived-field-set) leaves; fold/calculate
        transforms introduce fields not present in the raw data rows."""
        derived = set(derived)
        for t in node.get("transform", ()):
            if "fold" in t:
                derived.update(t.get("as", ()))
            if "calculate" in t:
                derived.add(t.get("as"))
        for key in ("hconcat", "vconcat", "layer"):
            if key in node:
                for child in node[key]:
                    yield from walk(child, derived)
                return
        if "facet" in node:
            for f in node["facet"].values():
                if isinstance(f, dict) and "field" in f:
                    assert any(f["field"] in row for row in values), f["field"]
            yield from walk(node["spec"], derived)
            return
        yield node, derived

    units = list(walk(spec, set()))
    assert units
    for unit, derived in units:
        assert "mark" in unit, unit
        fields = _encoded_fields(unit.get("encoding", {}))
        for field in fields:
            assert field in derived or any(field in row for row in values), (
                f"encoding references field {field!r} absent from the data"
            )
    return spec


@pytest.fixture(scope="module")
def trained(spark, persons):
    settings = SettingsCreator(
        comparisons=[
            _set(
                cl.ExactMatch("surname", term_frequency_adjustments=True),
                {1: (0.9, 0.02), 0: (0.1, 0.98)},
            ),
            _set(cl.ExactMatch("dob"), {1: (0.85, 0.01), 0: (0.15, 0.99)}),
        ],
        blocking_rules_to_generate_predictions=[block_on("dob")],
        probability_two_random_records_match=0.05,
    )
    return Linker(persons, settings)


def test_match_weights_chart_spec(trained):
    spec = validate_spec(trained.visualisations.match_weights_chart())
    vals = spec["data"]["values"]
    # golden structure: prior row first, every non-null level present
    assert vals[0]["comparison_name"] == "probability_two_random_records_match"
    assert {v["comparison_name"] for v in vals} == {
        "probability_two_random_records_match", "surname", "dob",
    }
    # x encodes the match weight
    assert spec["spec"]["encoding"]["x"]["field"] == "log2_bayes_factor"


def test_m_u_parameters_chart_spec(trained):
    spec = validate_spec(trained.visualisations.m_u_parameters_chart())
    kinds = {v["probability_type"] for v in spec["data"]["values"]}
    assert kinds == {"m_probability", "u_probability"}


def test_parameter_estimate_comparisons_chart_spec(spark, persons):
    settings = SettingsCreator(
        comparisons=[cl.ExactMatch("surname"), cl.ExactMatch("dob"),
                     cl.ExactMatch("city")],
        blocking_rules_to_generate_predictions=[block_on("dob")],
        probability_two_random_records_match=0.05,
    )
    linker = Linker(persons, settings)
    linker.training.estimate_parameters_using_expectation_maximisation(
        block_on("dob"), fix_u_probabilities=False
    )
    linker.training.estimate_parameters_using_expectation_maximisation(
        block_on("city"), fix_u_probabilities=False
    )
    spec = validate_spec(
        linker.visualisations.parameter_estimate_comparisons_chart()
    )
    assert spec["data"]["values"], "sessions must contribute estimates"
    m_only = linker.visualisations.parameter_estimate_comparisons_chart(
        include_u=False
    )
    assert {v["parameter"] for v in m_only["data"]["values"]} == {"m_probability"}


def test_match_weights_histogram_spec(trained):
    pred = trained.inference.predict()
    spec = validate_spec(trained.visualisations.match_weights_histogram(pred))
    vals = spec["data"]["values"]
    assert vals and all(
        v["splink_score_bin_high"] > v["splink_score_bin_low"] for v in vals
    )


def test_tf_adjustment_chart_spec(trained):
    spec = validate_spec(trained.visualisations.tf_adjustment_chart("surname"))
    assert spec["data"]["values"]
    # reference contract: a comparison without TF adjustment raises
    with pytest.raises(ValueError):
        trained.visualisations.tf_adjustment_chart("dob")


def test_waterfall_chart_spec(trained):
    pred = trained.inference.predict()
    records = [r.asDict() for r in pred.limit(3).collect()]
    spec = validate_spec(trained.visualisations.waterfall_chart(records))
    vals = spec["data"]["values"]
    # bars carry derived cumulative spans; final bar restates the total
    for rn in {v["record_number"] for v in vals}:
        bars = sorted(
            (v for v in vals if v["record_number"] == rn),
            key=lambda v: v["bar_sort_order"],
        )
        assert bars[0]["column_name"] == "Prior"
        assert bars[-1]["column_name"] == "Final score"
        assert bars[-1]["y_end"] == pytest.approx(bars[-2]["y_end"])
        assert bars[-1]["y_start"] == 0.0
    # record selector param filters by record_number
    assert spec["params"][0]["name"] == "record_number"


def test_unlinkables_chart_spec(trained):
    spec = validate_spec(trained.evaluation.unlinkables_chart())
    vals = spec["data"]["values"]
    assert vals[-1]["cum_proportion"] == pytest.approx(1.0)
    assert all(
        a["cum_proportion"] <= b["cum_proportion"]
        for a, b in zip(vals, vals[1:])
    )


def test_accuracy_analysis_output_types(trained):
    ts = trained.evaluation.accuracy_analysis_from_labels_column(
        "cluster", output_type="table"
    )
    assert ts.count() > 0  # DataFrame path
    for output_type in ("roc", "precision_recall", "accuracy",
                        "threshold_selection"):
        spec = validate_spec(
            trained.evaluation.accuracy_analysis_from_labels_column(
                "cluster", output_type=output_type
            )
        )
        assert spec["data"]["values"]
    with pytest.raises(ValueError, match="output_type"):
        trained.evaluation.accuracy_analysis_from_labels_column(
            "cluster", output_type="nope"
        )


def test_completeness_and_cumulative_chart_specs(spark, persons):
    import splink_spark.blocking_analysis as ba
    import splink_spark.exploratory as ex

    spec = validate_spec(ex.completeness_chart(persons))
    comp = {v["column"]: v["completeness"] for v in spec["data"]["values"]}
    assert comp["unique_id"] == 1.0

    spec = validate_spec(
        ba.chart_comparisons_from_blocking_rules(
            persons,
            blocking_rules=[block_on("dob"), "l.city = r.city"],
            record_sample_proportion=1.0,
        )
    )
    vals = spec["data"]["values"]
    assert [v["rule"] for v in vals] == [
        "l.dob = r.dob", "l.city = r.city"
    ] or len(vals) == 2
    assert vals[-1]["cumulative_comparison_count"] >= vals[-1][
        "marginal_comparison_count"
    ]


def test_comparison_vector_distribution_spec(trained):
    from splink_spark.internals.chart_specs import (
        comparison_vector_distribution_spec,
    )

    pred = trained.inference.predict()
    rows = [
        r.asDict()
        for r in trained.visualisations.comparison_vector_distribution(
            pred
        ).collect()
    ]
    spec = validate_spec(comparison_vector_distribution_spec(rows))
    assert spec["data"]["values"]


def test_save_offline_chart(trained, tmp_path):
    """Reference test_save_offline_chart: the chart writes a standalone
    HTML page embedding the spec."""
    spec = trained.visualisations.match_weights_chart()
    out = tmp_path / "chart.html"
    spec.save_offline_chart(str(out), print_msg=False)
    html = out.read_text()
    assert json.dumps(spec) in html and "vegaEmbed" in html
    with pytest.raises(ValueError, match="already exists"):
        spec.save_offline_chart(str(out), print_msg=False)
    spec.save_offline_chart(str(out), overwrite=True, print_msg=False)


def test_chart_spec_renders_in_notebooks(trained):
    """ChartSpec exposes the vegalite mimetype so notebook frontends render
    it without Altair."""
    spec = trained.visualisations.match_weights_chart()
    bundle = spec._repr_mimebundle_()
    assert "application/vnd.vegalite.v5+json" in bundle
    assert bundle["application/vnd.vegalite.v5+json"]["data"]["values"]

def test_cluster_studio_dashboard_html(trained, tmp_path):
    """cluster_studio_dashboard with out_path writes a standalone HTML page
    embedding the sampled nodes/edges and a force-directed vega spec."""
    pred = trained.inference.predict()
    clusters = trained.clustering.cluster_pairwise_predictions_at_threshold(
        pred, 0.5
    )
    out = tmp_path / "studio.html"
    nodes, edges = trained.visualisations.cluster_studio_dashboard(
        pred, clusters, out_path=str(out), sample_size=5
    )
    html = out.read_text()
    assert "cluster-select" in html and '"force"' in html
    # every sampled node id is embedded
    for r in nodes.collect():
        assert f'"{r["unique_id"]}"' in html
    with pytest.raises(ValueError, match="already exists"):
        trained.visualisations.cluster_studio_dashboard(
            pred, clusters, out_path=str(out)
        )


def test_comparison_viewer_dashboard_html(trained, tmp_path):
    pred = trained.inference.predict()
    out = tmp_path / "viewer.html"
    dist = trained.visualisations.comparison_viewer_dashboard(
        pred, out_path=str(out), num_example_rows=2
    )
    html = out.read_text()
    assert "pattern-select" in html and "vegaEmbed" in html
    # every distribution pattern appears in the page
    for r in dist.collect():
        assert r["gam_concat"] in html


def test_labelling_tool_html(trained, tmp_path):
    out = tmp_path / "label.html"
    target = 0
    cands = trained.evaluation.labelling_tool_for_specific_record(
        target, match_weight_threshold=-1e9, out_path=str(out)
    )
    html = out.read_text()
    assert "Download labels JSON" in html
    assert 'type="radio"' in html
    assert cands.count() > 0


def test_inline_js_embeds_local_bundles(trained, tmp_path):
    """inline_js embeds local vega bundles into the HTML (reference
    parity: its dashboards inline vendored JS and work air-gapped)."""
    import pytest

    from splink_spark.internals.dashboards import render_labelling_tool_html
    from splink_spark.internals.vega_assets import vega_script_tags

    jsdir = tmp_path / "vega_js"
    jsdir.mkdir()
    (jsdir / "vega.min.js").write_text("window.__FAKE_VEGA__=1;//</script>x")
    (jsdir / "vega-embed.min.js").write_text("window.__FAKE_EMBED__=1;")

    html = render_labelling_tool_html(
        [{"unique_id_l": 1, "unique_id_r": 2, "match_weight": 3.0}],
        inline_js=str(jsdir),
    )
    assert "__FAKE_VEGA__" in html and "__FAKE_EMBED__" in html
    assert "cdn.jsdelivr.net" not in html
    # a </script> inside the bundle must not end the block early
    assert "//<\\/script>x" in html

    # missing bundle: loud error naming the lib, not a silent CDN fallback
    with pytest.raises(FileNotFoundError, match="vega-lite"):
        vega_script_tags(("vega", "vega-lite"), str(jsdir))

    # default stays CDN
    cdn_html = render_labelling_tool_html(
        [{"unique_id_l": 1, "unique_id_r": 2, "match_weight": 3.0}]
    )
    assert "cdn.jsdelivr.net" in cdn_html

    # save_offline_chart inline_js path
    (jsdir / "vega-lite.min.js").write_text("window.__FAKE_VL__=1;")
    from splink_spark.internals.chart_specs import match_weights_chart_spec

    spec = match_weights_chart_spec([])
    out = tmp_path / "c.html"
    spec.save_offline_chart(str(out), print_msg=False, inline_js=str(jsdir))
    assert "__FAKE_VL__" in out.read_text()
