"""Browser review UI — the reference's primary surface, dependency-free.

The reference's first touch is a Streamlit app
(pages/02_Linkage_Review.py:1-208: side-by-side field groups with
mismatch highlighting, a label radio, a note box, prev/next/goto, and a
progress summary). Streamlit is not installable in this environment, so
the same surface is served with the standard library's ``http.server``
over the SAME session machinery the CLI reviewer uses
(:class:`~rlr_spark.cli.CLReviewer` — point queries, keyed label merge,
autosave, packet-cursor persistence). No JavaScript framework, no
dependency: plain HTML forms, one POST per action.

The server is single-threaded ON PURPOSE: review is a one-human
workload and the underlying reviewer (Spark driver calls, cursor state)
is not thread-safe; serializing requests is the correct concurrency
model, exactly like Streamlit's script-rerun-per-interaction.
"""

from __future__ import annotations

import html as _html
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs

from rlr_spark import REV_LABEL_COL, REV_NOTE_COL
from rlr_spark.cli import CLReviewer
from rlr_spark.report import render_label_summary

_STYLE = """
body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 60rem; }
table.pair { border-collapse: collapse; width: 100%; margin: 1rem 0; }
table.pair th, table.pair td { border: 1px solid #ccc; padding: .4rem .6rem; text-align: left; }
tr.mismatch td { background: #fff3e0; }
tr.match td { background: #e8f5e9; }
.nav, .labels { margin: .6rem 0; }
button { margin-right: .4rem; }
.current { font-weight: bold; }
pre.summary { background: #f5f5f5; padding: .6rem; }
.note { color: #555; }
"""


def _esc(v) -> str:
    return _html.escape("" if v is None else str(v))


class WebReviewer:
    """HTML rendering + action handling over a :class:`CLReviewer`."""

    def __init__(self, reviewer: CLReviewer) -> None:
        self.r = reviewer

    # -- actions (same semantics as CLReviewer.process_choice) ------------
    def apply(self, form: dict[str, list[str]]) -> None:
        r = self.r
        idx = r.session.cursor
        if "label" in form:
            choice = form["label"][0]
            labels = r.packet.label_choices
            if choice == "0":
                r._save(idx, label="")
            elif choice.isdigit() and 1 <= int(choice) <= len(labels):
                r._save(idx, label=labels[int(choice) - 1])
        elif "note" in form:
            r._save(idx, note=form["note"][0])
        elif "nav" in form:
            nav = form["nav"][0]
            if nav == "prev" and idx > 0:
                r.session.cursor = idx - 1
            elif nav == "next" and idx < r.n - 1:
                r.session.cursor = idx + 1
        elif "goto" in form:
            dest = form["goto"][0]
            if dest.isdigit() and 1 <= int(dest) <= r.n:
                r.session.cursor = int(dest) - 1

    # -- rendering --------------------------------------------------------
    def page(self) -> str:
        r = self.r
        idx = r.session.cursor
        row = r._grouped_row(idx)
        body = [f"<h2>Record Pair {idx + 1} / {r.n}</h2>"]
        if row is None:
            body.append("<p>pair key not found in the pair table</p>")
            cur_label, note = "", ""
        else:
            body.append('<table class="pair"><tr><th>Group</th><th>Left</th><th>Right</th></tr>')
            for g in r.packet.var_group_schema:
                name = g["name"].lower().replace(" ", "_")
                lv = row[f"grp_{name}_lvals"] or []
                rv = row[f"grp_{name}_rvals"] or []
                # the Streamlit page highlights agreement per group
                cls = "match" if list(lv) == list(rv) else "mismatch"
                body.append(
                    f'<tr class="{cls}"><td>{_esc(g["name"])}</td>'
                    f"<td>{_esc(' | '.join(map(str, lv)))}</td>"
                    f"<td>{_esc(' | '.join(map(str, rv)))}</td></tr>"
                )
            body.append("</table>")
            cur_label = row[REV_LABEL_COL] if REV_LABEL_COL in row.__fields__ else ""
            note = row[REV_NOTE_COL] if REV_NOTE_COL in row.__fields__ else ""

        # label radio (0 = No Label), current selection marked
        body.append('<form method="post" class="labels">')
        opts = ["No Label"] + list(r.packet.label_choices)
        for i, lab in enumerate(opts):
            sel = (
                "checked"
                if (i == 0 and cur_label not in r.packet.label_choices)
                or (i > 0 and cur_label == r.packet.label_choices[i - 1])
                else ""
            )
            body.append(
                f'<label><input type="radio" name="label" value="{i}" {sel}>'
                f" {_esc(lab)}</label> "
            )
        body.append('<button type="submit">Save label</button></form>')

        body.append(
            '<form method="post"><input name="note" size="60" '
            f'value="{_esc(note)}" placeholder="note (replaces current)">'
            '<button type="submit">Save note</button></form>'
        )
        if note:
            body.append(f'<p class="note">Note: {_esc(note)}</p>')

        # goto is its OWN form: inside the nav form, pressing Enter in
        # the text field would implicitly submit the form's FIRST button
        # (prev) and navigate backward instead of jumping
        body.append(
            '<form method="post" class="nav" style="display:inline">'
            '<button name="nav" value="prev">&laquo; Previous</button>'
            '<button name="nav" value="next">Next &raquo;</button></form> '
            '<form method="post" class="nav" style="display:inline">'
            f'<input name="goto" size="6" placeholder="1-{r.n}">'
            '<button type="submit">Go to</button></form>'
        )
        body.append(
            '<pre class="summary">'
            + _esc(render_label_summary(r.pairs, r.packet.label_choices))
            + "</pre>"
        )
        return (
            "<!doctype html><html><head><meta charset='utf-8'>"
            f"<title>rlr review</title><style>{_STYLE}</style></head>"
            "<body>" + "".join(body) + "</body></html>"
        )

    # -- server -----------------------------------------------------------
    def make_server(self, host: str = "127.0.0.1", port: int = 0) -> HTTPServer:
        web = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _respond_html(self, content: str, status: int = 200) -> None:
                data = content.encode("utf-8")
                self.send_response(status)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._respond_html(web.page())

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                # keep_blank_values: an EMPTY note box must still arrive
                # ('note': ['']) so clearing a note works — parse_qs
                # silently drops blank values by default
                form = parse_qs(
                    self.rfile.read(length).decode("utf-8"),
                    keep_blank_values=True,
                )
                web.apply(form)
                # POST-redirect-GET so refresh never re-submits
                self.send_response(303)
                self.send_header("Location", "/")
                self.end_headers()

        return HTTPServer((host, port), Handler)


def serve_packet(packet_path: str, host: str = "127.0.0.1", port: int = 8501, **kwargs):
    """``python -m rlr_spark.webui <packet.json> [port]`` — load the
    packet, serve the review UI until interrupted. Cursor and labels
    persist exactly as in the CLI loop (autosave + packet rewrite)."""
    from rlr_spark.session import get_spark
    from rlr_spark.sources.packet import ReviewPacket, ReviewSession

    spark = kwargs.pop("spark", None) or get_spark(app_name="rlr_webui")
    packet = ReviewPacket.load(packet_path)
    session = ReviewSession(spark, packet)
    reviewer = CLReviewer(session, packet_path=packet_path, **kwargs)
    server = WebReviewer(reviewer).make_server(host, port)
    print(f"review UI at http://{host}:{server.server_address[1]}/")
    try:
        server.serve_forever()
    finally:
        if reviewer.packet_path:
            reviewer.session.save_packet(reviewer.packet_path)
    return reviewer


if __name__ == "__main__":  # pragma: no cover
    import sys

    if len(sys.argv) > 1:
        serve_packet(sys.argv[1], port=int(sys.argv[2]) if len(sys.argv) > 2 else 8501)
    else:
        print("usage: python -m rlr_spark.webui <review_packet.json> [port]")
        sys.exit(2)
