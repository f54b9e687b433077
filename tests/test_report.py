from pyspark.sql import functions as F

from rlr_spark.datagen import VAR_SCHEMA_FIRM, generate_firm_fixtures
from rlr_spark.operators.compare import grouped_projection
from rlr_spark.operators.review import init_review_columns


def test_render_pair_marks_equality(spark):
    from rlr_spark.report import render_pair

    data_l, data_r, pairs_pd = generate_firm_fixtures()
    L = spark.createDataFrame(data_l)
    R = spark.createDataFrame(data_r.where(data_r.notna(), None))
    P = (
        spark.createDataFrame(pairs_pd)
        .withColumnRenamed("ein", "l_id")
        .withColumnRenamed("ui_num", "r_id")
    )
    g = grouped_projection(P, L, R, "ein", "ui_num", VAR_SCHEMA_FIRM)
    row = g.where("l_id = 100").collect()[0]
    text = render_pair(row, VAR_SCHEMA_FIRM)
    assert "Name" in text and "Address" in text and "Industry" in text
    # the Name group matches after normalization -> '=' marker on its line
    name_line = next(l for l in text.splitlines() if "Name" in l)
    assert " = " in name_line


def test_render_label_summary(spark):
    from rlr_spark.report import render_label_summary

    df = init_review_columns(
        spark.createDataFrame([(1,), (2,), (3,)], "id long")
    ).withColumn("rlr_label", F.when(F.col("id") == 1, "Match").otherwise(""))
    out = render_label_summary(df, ["Match", "Not a Match"])
    assert "Label Summary" in out and "Match" in out and "Unlabeled" in out
    assert "Total" in out


def test_linkage_quality_report_sections(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from rlr_spark.report import linkage_quality_report

    scored = spark.createDataFrame(
        [(1, 2, 6.2), (2, 3, 2.1), (1, 3, -3.0), (4, 5, 6.0)],
        ["l_id", "r_id", "fs_score"],
    )
    records = spark.createDataFrame([(i,) for i in range(1, 8)], ["doc_id"])
    truth = spark.createDataFrame([(1, 2), (4, 5)], ["l_id", "r_id"])
    md = linkage_quality_report(
        scored, records=records, truth=truth, thresholds=(0.0, 5.0)
    )
    assert "# Linkage quality report" in md
    assert "## Score distribution (4 scored pairs)" in md
    assert "## Unlinkables" in md
    assert "## Threshold sweep" in md
    assert "## Cluster stability" in md
    # records 6,7 have no candidates -> NULL bucket present
    assert "None | 2" in md.replace("| ", "| ").replace("  ", " ") or "None" in md
    # stability at t=5.0: two separate 2-clusters
    assert "| 5.0 | 2 | 4 | 2 |" in md


def test_linkage_quality_report_minimal(spark):
    from rlr_spark.report import linkage_quality_report

    scored = spark.createDataFrame([(1, 2, 1.0)], ["l_id", "r_id", "fs_score"])
    md = linkage_quality_report(scored)
    assert "Score distribution" in md
    assert "Unlinkables" not in md
    assert "Threshold sweep" not in md
