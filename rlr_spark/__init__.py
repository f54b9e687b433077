"""rlr_spark — a PySpark-native record-linkage / entity-resolution engine.

A from-scratch reimplementation of the capabilities of elansegarra/RLR
(reference at /root/reference, read-only) as a staged, resumable Spark
DataFrame pipeline:

    extract -> block -> pair-gen -> score -> cluster

The reference is the *human-review stage* of a record-linkage pipeline
(backend/rlr.py); this engine reproduces its semantics — review columns
(rlr.py:14-19), var-group comparison schema (rlr.py:231-260), the
match/nonmatch/uncertain label trichotomy (rlr.py:26, RLR_Home.py:117) —
while adding the scale stages (blocking, Fellegi-Sunter scoring,
connected-component clustering) as idiomatic PySpark.

Nothing here is ported from the reference: the reference is eager,
row-oriented pandas; this engine is lazy, declarative DataFrames with
explicit partitioning/skew handling designed for multi-executor clusters.
"""

__version__ = "0.1.0"

REV_LABEL_COL = "rlr_label"
REV_LABEL_IND_COL = "rlr_label_ind"
REV_DATE_COL = "rlr_modified"
REV_NOTE_COL = "rlr_note"
REV_ID_IN_L_COL = "rlr_l_id_exists"
REV_ID_IN_R_COL = "rlr_r_id_exists"

#: Review columns in reference order (backend/rlr.py:14-19).
REVIEW_COLUMNS = [
    REV_LABEL_COL,
    REV_LABEL_IND_COL,
    REV_DATE_COL,
    REV_NOTE_COL,
    REV_ID_IN_L_COL,
    REV_ID_IN_R_COL,
]

#: Default labels (backend/rlr.py:26) + the uncertain example (RLR_Home.py:117).
DEFAULT_LABELS = ["Match", "Not a Match"]
LABEL_MATCH = "Match"
LABEL_NONMATCH = "Not a Match"
LABEL_UNCERTAIN = "Maybe a Match"

#: Pair-coverage warning threshold (backend/rlr.py:20).
COMP_EXIST_THRESH = 0.8
