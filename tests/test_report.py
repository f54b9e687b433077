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
