"""Text-extraction byte-identity — a named correctness gate
(BASELINE.json input_hint: byte-identical extracted text per url)."""

from pyspark.sql import functions as F

from rlr_spark.datagen import render_html
from rlr_spark.operators.extract import extract_text, extract_text_bytes


def test_pure_function_inverts_template():
    text = "hello wörld \t spaced  text"
    assert extract_text_bytes(render_html("t", text)) == text


def test_pure_function_edge_cases():
    assert extract_text_bytes(None) is None
    assert extract_text_bytes(b"<html>no body</html>") is None
    assert extract_text_bytes(render_html("t", "")) == ""


def test_byte_identity_on_corpus(web_pages_small):
    pages, _ = web_pages_small
    extracted = extract_text(pages.drop("text"), out_col="text_x")
    mism = (
        extracted.join(pages.select("url", "text"), "url")
        .where(
            F.col("text_x").isNull()
            | (F.encode("text_x", "UTF-8") != F.encode("text", "UTF-8"))
        )
        .count()
    )
    assert mism == 0
