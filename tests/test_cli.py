"""Interactive CLI reviewer: drive the REPL with scripted stdin and
assert labels, notes, and the cursor land on disk (reference
CL_review_comparisons / CL_process_choice, backend/rlr.py:517-682)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from rlr_spark.cli import CLReviewer
from rlr_spark.datagen import VAR_SCHEMA_FIRM, generate_firm_fixtures
from rlr_spark.sources.packet import ReviewPacket, ReviewSession


@pytest.fixture()
def packet_session(spark, tmp_path):
    data_l, data_r, pairs = generate_firm_fixtures()
    # drop the duplicated + missing-id rows: this is the clean review slice
    pairs = pairs.drop_duplicates().query("ein != 999").reset_index(drop=True)
    l_path = str(tmp_path / "dataL.parquet")
    r_path = str(tmp_path / "dataR.parquet")
    p_path = str(tmp_path / "pairs.parquet")
    spark.createDataFrame(data_l).write.parquet(l_path)
    spark.createDataFrame(data_r).write.parquet(r_path)
    spark.createDataFrame(pairs).write.parquet(p_path)
    packet = ReviewPacket(
        file_L=l_path,
        file_L_ids=["ein"],
        file_R=r_path,
        file_R_ids=["ui_num"],
        file_comps=p_path,
        var_group_schema=VAR_SCHEMA_FIRM,
        label_choices=["Match", "Not a Match", "Maybe a Match"],
    )
    packet_path = str(tmp_path / "packet.json")
    packet.save(packet_path)
    return ReviewSession(spark, packet), packet_path, str(tmp_path)


def _scripted(inputs: list[str]):
    it = iter(inputs)

    def fake_input(prompt: str) -> str:
        return next(it)

    return fake_input


def test_review_loop_labels_and_cursor_persist(spark, packet_session, tmp_path):
    session, packet_path, root = packet_session
    out_path = root + "/reviewed.parquet"
    printed: list[str] = []
    # label pair 1 Match -> auto-stays -> n -> label pair 2 Not a Match ->
    # g(oto) 5 -> add note -> s(ummary) -> e(xit)
    reviewer = CLReviewer(
        session,
        comp_pairs_path=out_path,
        packet_path=packet_path,
        input_fn=_scripted(
            ["1", "n", "2", "g", "5", "a", "check the address", "s", "e"]
        ),
        print_fn=printed.append,
    )
    reviewer.review()

    saved = spark.read.parquet(out_path)
    got = {
        (r.ein, r.ui_num): (r.rlr_label, r.rlr_note, r.rlr_label_ind)
        for r in saved.collect()
    }
    assert got[(100, 500)] == ("Match", "", 1)
    assert got[(101, 501)] == ("Not a Match", "", 1)
    assert got[(104, 504)] == ("", "check the address", 0)
    # rlr_modified stamped on touched rows only
    stamped = {
        (r.ein, r.ui_num)
        for r in saved.where(F.col("rlr_modified").isNotNull()).collect()
    }
    assert stamped == {(100, 500), (101, 501), (104, 504)}

    # cursor persisted to the packet (rlr.py:224-228, 746-781)
    with open(packet_path) as f:
        assert json.load(f)["curr_comp_pair_index"] == 4

    # the rendered stream showed the pair header and the summary box
    blob = "\n".join(printed)
    assert "Record Pair 1/7" in blob
    assert "Label Summary" in blob
    assert "<1> Match" in blob  # current-label highlighting after save


def test_review_loop_validates_choices_and_bounds(spark, packet_session):
    session, packet_path, _ = packet_session
    printed: list[str] = []
    reviewer = CLReviewer(
        session,
        comp_pairs_path=session.packet.file_comps + ".x.parquet",
        input_fn=_scripted(["z", "p", "e"]),  # invalid, prev-at-start, exit
        print_fn=printed.append,
        autosave=False,
    )
    reviewer.review()
    blob = "\n".join(printed)
    assert "*** Invalid Choice ***" in blob
    assert "can't go to previous" in blob
    assert session.cursor == 0


def test_composite_key_session(spark, tmp_path):
    """The RLR_Home.py:96-119 packet shape: composite ids
    ['year','ein'] vs ['ref_year','ui_num'] — flags computed on the FULL
    tuple (fixing the reference's single-column TODO, rlr.py:175-178)."""
    data_l, data_r, pairs = generate_firm_fixtures()
    pairs = pairs.drop_duplicates().reset_index(drop=True)
    pairs["year"] = 2020
    pairs["ref_year"] = 2020
    # a pair whose ein exists but whose year doesn't: the reference's
    # first-column-only check (year) would flag it found; the full-tuple
    # check must not
    pairs.loc[len(pairs)] = {"ein": 100, "ui_num": 500, "year": 1999, "ref_year": 2020}

    l_path, r_path, p_path = (
        str(tmp_path / n) for n in ("L.parquet", "R.parquet", "P.parquet")
    )
    spark.createDataFrame(data_l).write.parquet(l_path)
    spark.createDataFrame(data_r).write.parquet(r_path)
    spark.createDataFrame(pairs).write.parquet(p_path)
    packet = ReviewPacket(
        file_L=l_path,
        file_L_ids=["year", "ein"],
        file_R=r_path,
        file_R_ids=["ref_year", "ui_num"],
        file_comps=p_path,
        var_group_schema=VAR_SCHEMA_FIRM,
        label_choices=["Match", "Not a Match"],
    )
    session = ReviewSession(spark, packet)
    flags = {
        (r.year, r.ein, r.ui_num): (r.rlr_l_id_exists, r.rlr_r_id_exists)
        for r in session.pairs.collect()
    }
    assert flags[(2020, 100, 500)] == (1, 1)
    assert flags[(1999, 100, 500)] == (0, 1)  # year mismatch -> not found in L
    assert flags[(2020, 999, 507)] == (0, 1)  # ein absent from L

    # the CLI renders composite-key pairs (grouped projection joins on
    # the full tuple)
    printed: list[str] = []
    reviewer = CLReviewer(
        session,
        comp_pairs_path=str(tmp_path / "out.parquet"),
        input_fn=_scripted(["1", "e"]),
        print_fn=printed.append,
    )
    reviewer.review()
    saved = spark.read.parquet(str(tmp_path / "out.parquet"))
    labeled = saved.where(F.col("rlr_label") == "Match").collect()
    assert len(labeled) == 1
    blob = "\n".join(printed)
    assert "Record Pair 1/" in blob


def test_reviewer_refuses_oversized_pair_table(spark, packet_session):
    """The cursor collects every pair key to the driver — review-sized by
    contract. A table above max_pairs must be refused with a filtering
    hint, not collected (driver-OOM guard at real blocking-output sizes)."""
    session, packet_path, tmp = packet_session
    with pytest.raises(ValueError, match="review limit"):
        CLReviewer(session, packet_path=packet_path, max_pairs=2)
    # explicit raise of the limit re-enables the same table
    r = CLReviewer(session, packet_path=packet_path, max_pairs=1_000)
    assert r.n > 2
