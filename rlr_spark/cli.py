"""Interactive command-line review loop — the reference's daily surface.

Reimplements the reference's REPL (``CL_review_comparisons`` /
``CL_comparison_query`` / ``CL_process_choice``, backend/rlr.py:517-682)
over the Spark-backed :class:`~rlr_spark.sources.packet.ReviewSession`:

  - render the current pair as a grouped three-column table
    (operators.compare.grouped_projection + report.render_pair);
  - digit choices assign a label (0 clears), ``a`` sets a note,
    ``p``/``n``/``g`` move the cursor, ``s`` prints the label summary,
    ``e`` exits (rlr.py:607-645);
  - every label/note save stamps ``rlr_modified`` and autosaves the pair
    table (rlr.py:740-744), and the cursor is persisted to the review
    packet on save/exit (rlr.py:224-228, 746-781).

Driver-side by design: a review slice is human-sized, so the ordered
pair *keys* are collected once (the reference collects the entire table
into pandas); each render and each label write stays a Spark point
query / keyed merge, so the same loop works unchanged when the pair
table is a big catalog table.

``input_fn`` / ``print_fn`` are injectable for tests (monkeypatched
stdin is how the loop is driven under pytest).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rlr_spark import REV_LABEL_COL, REV_NOTE_COL
from rlr_spark.operators.compare import grouped_projection
from rlr_spark.operators.review import upsert_labels
from rlr_spark.report import render_label_summary, render_pair
from rlr_spark.sources.packet import ReviewSession
from rlr_spark.sources.writers import write_csv

#: extra options after the numeric label choices (rlr.py:24-25 analogue)
ADDTL_OPTIONS = [
    ("p", "Previous"),
    ("n", "Next"),
    ("g", "Go to"),
    ("a", "Add note"),
    ("s", "Summary"),
    ("e", "Exit"),
]


class CLReviewer:
    """REPL over a ReviewSession's pair table.

    Args:
        session: a loaded ReviewSession.
        comp_pairs_path: where label saves are autosaved (CSV dir via
            Spark writer, or ``.parquet`` dir). Defaults to the packet's
            ``file_comps`` + ``.reviewed``.
        packet_path: when given, the packet JSON (with the live cursor)
            is rewritten on every save and on exit.
        autosave: persist the pair table after each label/note
            (reference default, rlr.py:42).
        max_pairs: refuse to open a pair table larger than this
            (default 1,000,000). The cursor holds every key tuple on
            the driver — review-sized by contract, like the reference's
            in-memory comps file — so pointing the reviewer at a full
            blocking output would OOM the driver. Filter first (e.g.
            the uncertain band: ``pairs.where("rlr_label = ''")``) or
            raise the limit explicitly.
    """

    def __init__(
        self,
        session: ReviewSession,
        comp_pairs_path: str | None = None,
        packet_path: str | None = None,
        autosave: bool = True,
        width: int = 80,
        input_fn: Callable[[str], str] = input,
        print_fn: Callable[[str], None] = print,
        max_pairs: int = 1_000_000,
    ) -> None:
        self.session = session
        self.packet = session.packet
        self.width = width
        self.autosave = autosave
        self.packet_path = packet_path
        self.comp_pairs_path = comp_pairs_path or (self.packet.file_comps + ".reviewed")
        self._input = input_fn
        self._print = print_fn
        self.key_cols = list(self.packet.file_L_ids) + list(self.packet.file_R_ids)
        self.pairs: DataFrame = session.pairs
        # ordered pair keys, collected once: the positional cursor's
        # source of truth (the reference holds the whole table in pandas;
        # we hold only the key tuples). INTENTIONAL DEVIATION from the
        # reference: the cursor is positional over the KEY-SORTED order,
        # not the comps-file row order (rlr.py:224-228) — a distributed
        # scan has no stable row order, so key order is the only
        # deterministic one. A packet saved by the reference therefore
        # resumes at the same ORDINAL position but possibly a different
        # pair; packets round-trip exactly within this tool.
        #
        # guard BEFORE collecting: count() is distributed and cheap,
        # the key collect is driver-memory-bound
        n_pairs = self.pairs.count()
        if n_pairs > max_pairs:
            raise ValueError(
                f"pair table has {n_pairs:,} rows, above the review limit "
                f"of {max_pairs:,}. The reviewer keeps every pair key on "
                "the driver; filter the table first (e.g. the uncertain "
                "band: pairs.where(\"rlr_label = ''\")) or pass a larger "
                "max_pairs explicitly."
            )
        self.keys = [
            tuple(r) for r in self.pairs.select(*self.key_cols).orderBy(*self.key_cols).collect()
        ]
        self.n = len(self.keys)

    # -- point queries ---------------------------------------------------------
    def _key_filter(self, idx: int):
        key = self.keys[idx]
        cond = F.lit(True)
        for c, v in zip(self.key_cols, key):
            cond = cond & (F.col(c) == F.lit(v))
        return cond

    def _pair_slice(self, idx: int) -> DataFrame:
        return self.pairs.where(self._key_filter(idx))

    def _grouped_row(self, idx: int):
        g = grouped_projection(
            self._pair_slice(idx),
            self.session.data_l,
            self.session.data_r,
            self.packet.file_L_ids,
            self.packet.file_R_ids,
            self.packet.var_group_schema,
            l_pair_col=self.packet.file_L_ids,
            r_pair_col=self.packet.file_R_ids,
        )
        rows = g.collect()
        return rows[0] if rows else None

    # -- rendering (fresh implementations of the CL_* surfaces) ----------------
    def render_current(self) -> str:
        idx = self.session.cursor
        row = self._grouped_row(idx)
        head = f"Record Pair {idx + 1}/{self.n}"
        lines = [
            "+" + "-" * (self.width - 2) + "+",
            "|" + head.center(self.width - 2) + "|",
            "+" + "-" * (self.width - 2) + "+",
        ]
        if row is None:
            lines.append("**** pair key not found in the pair table ****")
            return "\n".join(lines)
        lines.append(render_pair(row, self.packet.var_group_schema, width=self.width))
        note = row[REV_NOTE_COL] if REV_NOTE_COL in row.__fields__ else ""
        if note:
            lines.append(f"Note: {note}")
        cur_label = row[REV_LABEL_COL] if REV_LABEL_COL in row.__fields__ else ""
        lines.append(self._options_text(cur_label))
        return "\n".join(lines)

    def _options_text(self, cur_label: str) -> str:
        opts = ["No Label"] + list(self.packet.label_choices)
        sel = (
            self.packet.label_choices.index(cur_label) + 1
            if cur_label in self.packet.label_choices
            else 0
        )
        parts = [
            (f"<{i}> {lab}" if i == sel else f"({i}) {lab}") for i, lab in enumerate(opts)
        ]
        extra = " ".join(f"({tag}) {text}" for tag, text in ADDTL_OPTIONS)
        return (
            "Label Options (<> = current label):\n"
            + " ".join(parts)
            + "\nOther Options:\n"
            + extra
        )

    # -- persistence -----------------------------------------------------------
    def _save(self, idx: int, label: str | None = None, note: str | None = None) -> None:
        """save_label_or_note (rlr.py:698-744): keyed merge + stamp + autosave."""
        key = self.keys[idx]
        upd_row = dict(zip(self.key_cols, key))
        if label is not None:
            upd_row[REV_LABEL_COL] = label
        if note is not None:
            upd_row[REV_NOTE_COL] = note
        upd = self.session.spark.createDataFrame(
            [upd_row], schema=self.pairs.select(*upd_row.keys()).schema
        )
        self.pairs = upsert_labels(
            self.pairs, upd, self.key_cols, list(self.packet.label_choices)
        )
        if self.autosave:
            self._persist()
        else:
            # truncate the upsert lineage so a long session doesn't grow
            # an unbounded plan
            self.pairs = self.pairs.localCheckpoint(eager=True)
        if self.packet_path:
            self.session.cursor = idx
            self.session.save_packet(self.packet_path)

    def _persist(self) -> None:
        """Autosave (rlr.py:743-744): rewrite the pair table, re-read so
        the session's plan is a clean scan of the saved state."""
        spark = self.session.spark
        if self.comp_pairs_path.endswith(".parquet"):
            tmp = self.comp_pairs_path + ".tmp"
            self.pairs.write.mode("overwrite").parquet(tmp)
            saved = spark.read.parquet(tmp)
            saved.write.mode("overwrite").parquet(self.comp_pairs_path)
            self.pairs = spark.read.parquet(self.comp_pairs_path)
        else:
            # CSV keeps no timestamp precision promises; used for parity
            # with the reference's to_csv autosave (rlr.py:692)
            out = self.pairs.withColumn(
                "rlr_modified", F.date_format("rlr_modified", "yyyy-MM-dd HH:mm:ss")
            )
            write_csv(out, self.comp_pairs_path, mode="overwrite")
            schema = self.pairs.schema
            self.pairs = (
                spark.read.option("header", "true")
                .schema(schema)
                .csv(self.comp_pairs_path)
            )

    # -- the loop ----------------------------------------------------------------
    def _valid_choices(self) -> list[str]:
        return [str(i) for i in range(len(self.packet.label_choices) + 1)] + [
            tag for tag, _ in ADDTL_OPTIONS
        ]

    def query_choice(self) -> str:
        """Render the current pair and gather one validated choice
        (CL_comparison_query, rlr.py:517-588)."""
        self._print(self.render_current())
        valid = self._valid_choices()
        choice = self._input("Enter Choice: ").lower()
        while choice not in valid:
            self._print("*** Invalid Choice ***")
            choice = self._input("Enter Choice: ").lower()
        return choice

    def process_choice(self, choice: str) -> None:
        """Act on a validated choice (CL_process_choice, rlr.py:590-645)."""
        idx = self.session.cursor
        labels = self.packet.label_choices
        if choice == "0":
            self._save(idx, label="")
        elif choice.isdigit() and 1 <= int(choice) <= len(labels):
            self._save(idx, label=labels[int(choice) - 1])
        elif choice == "p":
            if idx == 0:
                self._print("** This was first comparison pair, can't go to previous **")
            else:
                self.session.cursor = idx - 1
        elif choice == "n":
            if idx >= self.n - 1:
                self._print("** This was final comparison pair, can't go to next **")
            else:
                self.session.cursor = idx + 1
        elif choice == "g":
            valid = [str(i) for i in range(1, self.n + 1)]
            dest = self._input(f"Enter Comp. Number (1-{self.n}): ")
            while dest not in valid:
                self._print(
                    f"** This index is not valid, must be integer between 1 and {self.n} **"
                )
                dest = self._input(f"Enter Comp. Number (1-{self.n}): ")
            self.session.cursor = int(dest) - 1
        elif choice == "a":
            note = self._input("Enter note (replaces current note): ")
            self._save(idx, note=note)
        elif choice == "s":
            self._print(render_label_summary(self.pairs, self.packet.label_choices))
        # 'e' handled by the loop

    def review(self) -> None:
        """The REPL (CL_review_comparisons, rlr.py:646-682): render,
        gather, process, repeat until exit; cursor persisted on exit."""
        if self.n == 0:
            self._print("No pairs to review.")
            return
        choice = ""
        while choice != "e":
            choice = self.query_choice()
            self.process_choice(choice)
            self._print("")
        if self.packet_path:
            self.session.save_packet(self.packet_path)


def review_packet_main(packet_path: str, **kwargs) -> CLReviewer:
    """``python -m rlr_spark.cli <packet.json>`` — the reference's
    ``main()`` shape (rlr.py:787-795): load packet, start reviewing."""
    from rlr_spark.session import get_spark
    from rlr_spark.sources.packet import ReviewPacket

    spark = kwargs.pop("spark", None) or get_spark(app_name="rlr_cli")
    packet = ReviewPacket.load(packet_path)
    session = ReviewSession(spark, packet)
    reviewer = CLReviewer(session, packet_path=packet_path, **kwargs)
    reviewer.review()
    return reviewer


if __name__ == "__main__":  # pragma: no cover
    import sys

    if len(sys.argv) > 1:
        review_packet_main(sys.argv[1])
    else:
        print("usage: python -m rlr_spark.cli <review_packet.json>")
        sys.exit(2)
