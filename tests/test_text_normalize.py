"""normalize_text / strip_markup tests (splink_spark/pipeline/text.py)."""

from __future__ import annotations

from splink_spark.pipeline.text import normalize_text, strip_markup


def test_normalize_text_folds_accents_case_whitespace_control(spark):
    df = spark.createDataFrame(
        [
            (1, "  À la  «Café»\tNaïve\x01 ÉLÈVE  "),
            (2, "plain ascii"),
            (3, None),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["normalized_text"]
        for r in normalize_text(df).collect()
    }
    assert got[1] == "a la «cafe» naive eleve"
    assert got[2] == "plain ascii"
    assert got[3] is None


def test_normalize_text_toggles(spark):
    df = spark.createDataFrame([(1, "Café  X")], "doc_id bigint, text string")
    keep_case = normalize_text(df, lowercase=False).collect()[0][-1]
    assert keep_case == "Cafe X"
    keep_accent = normalize_text(df, fold_accents=False).collect()[0][-1]
    assert keep_accent == "café x"
    no_collapse = normalize_text(df, collapse_whitespace=False).collect()[0][-1]
    assert no_collapse == "cafe  x"


def test_strip_markup_removes_tags_scripts_entities(spark):
    df = spark.createDataFrame(
        [
            (1, "<html><body><h1>Title</h1><script>var x=1;</script>"
                "<p>Hello &amp; <b>world</b></p><!-- note --></body></html>"),
            (2, "<style>.a{color:red}</style>text &lt;kept&gt; &nbsp;here"),
            (3, "no markup"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["stripped_text"] for r in strip_markup(df).collect()}
    assert got[1] == "Title Hello & world"
    assert got[2] == "text <kept> here"
    assert got[3] == "no markup"


def test_strip_markup_no_double_decode(spark):
    # &amp; decodes LAST: the literal text `&amp;lt;` means "&lt;" and
    # must NOT double-decode into a real angle bracket
    df = spark.createDataFrame(
        [(1, "escaped entity &amp;lt;b&amp;gt; and &amp;amp; stay text")],
        "doc_id bigint, text string",
    )
    got = strip_markup(df).collect()[0]["stripped_text"]
    assert got == "escaped entity &lt;b&gt; and &amp; stay text"
