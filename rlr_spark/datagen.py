"""Deterministic synthetic web-pages corpus with planted entity clusters.

Generates the pipeline input table in exactly the shape the north rule
mandates (BASELINE.json input_hint):

    web_pages(url string, warc_ts timestamp, html binary, text string,
              lang string)

plus a planted-truth side table ``truth(url string, entity_id long)``
that drives pairwise-F1 and cluster-membership checks (FIXTURES.md F1).

Everything is a pure function of (n_pages, seed): numpy RandomState,
fixed epoch timestamps (no ``now()``), no external data. Generation is
plain numpy/pandas + pyarrow — the *engine* under test is Spark; the
*fixture generator* deliberately is not.

Planted structure:
  - entities with cluster sizes 1..6 (~55% singletons);
  - duplicate members are the base text verbatim (exact dup) or with
    seeded token edits at ~6% rate (near dup);
  - one "mega" domain holds ~30% of pages (exercises skew/salting,
    FIXTURES.md F1 url notes); remaining pages Zipf-spread over smaller
    domains;
  - ~70% of duplicate members stay on the base member's domain (caught
    by the domain blocking pass), ~30% move domains (caught only by the
    MinHash-LSH pass — exercises multi-pass blocking union);
  - html wraps text in a fixed template; extraction must recover
    ``text`` byte-identically (BASELINE.json correctness gate).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

EPOCH = pd.Timestamp("2021-06-01 00:00:00")

# ~200-word base vocabulary (web-ish English); random docs overlap only
# lightly, planted near-dups overlap heavily.
_VOCAB = (
    "the quick brown fox jumps over lazy dog market report quarterly revenue "
    "growth product launch customer service support ticket order shipping "
    "return policy privacy terms conditions account login password reset "
    "email address phone number street city state country zip code company "
    "profile about contact news blog article author published updated "
    "category tag search results page next previous home menu footer header "
    "price discount sale offer limited time free trial subscribe newsletter "
    "download upload file document image video audio player settings theme "
    "dark light mode language english spanish french german chinese review "
    "rating stars comment reply share like follow social media network "
    "profile friend message inbox sent draft archive delete restore backup "
    "server cloud storage database query table row column index key value "
    "cache memory disk network latency throughput error warning info debug "
    "trace log metric alert dashboard chart graph report export import csv "
    "json xml html css script style font color size width height margin "
    "padding border layout grid flex responsive mobile desktop tablet touch "
    "click scroll swipe gesture keyboard mouse pointer focus blur hover "
    "active visited link button form input select option checkbox radio "
    "submit cancel confirm dialog modal popup tooltip notification badge"
).split()

_LANG_MARKERS = {
    "en": ["the", "and", "with", "from", "this"],
    "de": ["und", "der", "die", "das", "nicht"],
    "fr": ["les", "des", "avec", "pour", "dans"],
}

_HTML_PREFIX = "<html><head><title>{title}</title></head><body><p>"
_HTML_SUFFIX = "</p></body></html>"


def render_html(title: str, text: str) -> bytes:
    """The fixed page template. Extraction inverts this exactly."""
    return (_HTML_PREFIX.format(title=title) + text + _HTML_SUFFIX).encode("utf-8")


def _make_text(rng: np.random.RandomState, lang: str) -> str:
    n = int(rng.randint(30, 120))
    words = [_VOCAB[i] for i in rng.randint(0, len(_VOCAB), size=n)]
    # sprinkle language markers so the lang-id heuristic has signal
    markers = _LANG_MARKERS.get(lang, _LANG_MARKERS["en"])
    for _ in range(max(2, n // 12)):
        words[int(rng.randint(0, n))] = markers[int(rng.randint(0, len(markers)))]
    return " ".join(words)


def _perturb(rng: np.random.RandomState, text: str, rate: float = 0.06) -> str:
    """Seeded token edits: replace/delete/insert ~rate of tokens."""
    toks = text.split()
    out: list[str] = []
    for t in toks:
        r = rng.random_sample()
        if r < rate / 3:
            continue  # delete
        if r < 2 * rate / 3:
            out.append(_VOCAB[int(rng.randint(0, len(_VOCAB)))])  # replace
        else:
            out.append(t)
        if rng.random_sample() < rate / 3:
            out.append(_VOCAB[int(rng.randint(0, len(_VOCAB)))])  # insert
    return " ".join(out) if out else text


def generate_web_pages(
    n_pages: int, seed: int = 42, n_domains: int = 50
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (web_pages, truth) pandas frames, deterministic in (n_pages, seed)."""
    rng = np.random.RandomState(seed)

    domains = ["mega-site.com"] + [f"site-{i:03d}.example.org" for i in range(1, n_domains)]
    # Zipf-ish weights with domain 0 pinned to ~30% of mass
    w = 1.0 / np.arange(1, n_domains + 1, dtype="float64")
    w = w / w.sum() * 0.7
    w[0] = 0.3
    w = w / w.sum()

    urls: list[str] = []
    texts: list[str] = []
    langs: list[str] = []
    entity_ids: list[int] = []

    entity = 0
    lang_choices = np.array(["en", "en", "en", "en", "en", "en", "de", "fr"])
    while len(urls) < n_pages:
        size_draw = rng.random_sample()
        if size_draw < 0.55:
            size = 1
        else:
            size = int(rng.randint(2, 7))
        size = min(size, n_pages - len(urls))
        lang = str(lang_choices[int(rng.randint(0, len(lang_choices)))])
        base_text = _make_text(rng, lang)
        base_domain = domains[int(rng.choice(n_domains, p=w))]
        for m in range(size):
            if m == 0:
                text = base_text
                domain = base_domain
            else:
                text = base_text if rng.random_sample() < 0.4 else _perturb(rng, base_text)
                if rng.random_sample() < 0.7:
                    domain = base_domain  # domain-blocking pass catches it
                else:
                    domain = domains[int(rng.choice(n_domains, p=w))]  # LSH pass
            uid = len(urls)
            path = f"p{int(rng.randint(0, 10**9)):09d}"
            urls.append(f"https://{domain}/{path}/{uid}")
            texts.append(text)
            langs.append(lang)
            entity_ids.append(entity)
        entity += 1

    titles = [f"Page {i}" for i in range(n_pages)]
    html = [render_html(titles[i], texts[i]) for i in range(n_pages)]
    warc_ts = EPOCH + pd.to_timedelta(np.arange(n_pages), unit="s")

    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": warc_ts,
            "html": html,
            "text": texts,
            "lang": langs,
        }
    )
    truth = pd.DataFrame({"url": urls, "entity_id": np.asarray(entity_ids, dtype="int64")})
    return pages, truth


def write_web_pages(out_dir: str, n_pages: int, seed: int = 42) -> tuple[str, str]:
    """Write web_pages + truth parquet under out_dir; return their paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages, truth = generate_web_pages(n_pages, seed)
    os.makedirs(out_dir, exist_ok=True)
    pages_path = os.path.join(out_dir, "web_pages.parquet")
    truth_path = os.path.join(out_dir, "truth.parquet")
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    # bounded row groups: a single-row-group file is unsplittable — one
    # Spark task would read the whole corpus no matter how many byte
    # splits the scan plans (real web corpora ship as many files/row
    # groups, so this is the realistic layout, not just a bench fix)
    pq.write_table(
        pa.Table.from_pandas(pages, schema=schema, preserve_index=False),
        pages_path,
        row_group_size=2000,
    )
    pq.write_table(
        pa.Table.from_pandas(truth, preserve_index=False),
        truth_path,
        row_group_size=50_000,
    )
    return pages_path, truth_path


def write_web_pages_warc(
    out_dir: str, n_pages: int, seed: int = 42, n_segments: int = 4
) -> tuple[str, str]:
    """Same corpus as :func:`write_web_pages`, serialized as WARC
    segment files (.warc.gz, one gzip member per record — the Common
    Crawl layout) instead of parquet; the truth table stays parquet.
    Returns (warc_glob, truth_path). The response payloads are the
    exact ``html`` bytes, so the extract stage's byte-identity
    contract is testable straight off the archive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rlr_spark.sources.warc import write_warc

    pages, truth = generate_web_pages(n_pages, seed)
    warc_dir = os.path.join(out_dir, "warc")
    os.makedirs(warc_dir, exist_ok=True)
    per = -(-len(pages) // n_segments)
    for s in range(n_segments):
        chunk = pages.iloc[s * per : (s + 1) * per]
        if chunk.empty:
            continue
        write_warc(
            os.path.join(warc_dir, f"seg-{s:05d}.warc.gz"),
            [
                {
                    "warc_type": "response",
                    "target_uri": r.url,
                    "date": r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                    "http_status": 200,
                    "http_content_type": "text/html; charset=utf-8",
                    "body": bytes(r.html),
                    "content_type": "application/http; msgtype=response",
                }
                for r in chunk.itertuples()
            ],
        )
    truth_path = os.path.join(out_dir, "truth.parquet")
    pq.write_table(
        pa.Table.from_pandas(truth, preserve_index=False),
        truth_path,
        row_group_size=50_000,
    )
    return os.path.join(warc_dir, "*.warc.gz"), truth_path


# ---------------------------------------------------------------------------
# Reference-parity firm fixtures (FIXTURES.md F2/F3, mirrors RLR_Home.py:96-119)
# ---------------------------------------------------------------------------

def generate_firm_fixtures(seed: int = 7) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """(dataL, dataR, comp_pairs) for parity tests against the reference rlr class.

    Single-column ids (``ein`` / ``ui_num``) because the reference's
    id-existence check only supports those (backend/rlr.py:175-178).
    Includes case/whitespace-only differences (comparator must still
    match, pages/02:137-143), a NaN, pairs with missing ids (existence
    flags, rlr.py:168-185), and a duplicated pair (warn-only,
    rlr.py:151-155).
    """
    rng = np.random.RandomState(seed)
    n = 12
    names = [f"Acme Widgets {i}" for i in range(n)]
    data_l = pd.DataFrame(
        {
            "ein": np.arange(100, 100 + n, dtype="int64"),
            "year": 2020,
            "name": names,
            "addy_city": ["Springfield"] * n,
            "addy_state": ["IL"] * n,
            "sic_code": rng.randint(1000, 9999, size=n),
            "sic_text": ["manufacturing"] * n,
        }
    )
    # R mirrors L with case/space noise on matching rows
    data_r = pd.DataFrame(
        {
            "ui_num": np.arange(500, 500 + n, dtype="int64"),
            "ref_year": 2020,
            "company_name": [f"  ACME widgets {i} " for i in range(n)],
            "city": ["springfield "] * n,
            "state": ["il"] * n,
            "naics": rng.randint(10000, 99999, size=n),
            "naics_name": ["manufacturing"] * n,
        }
    )
    data_r.loc[3, "company_name"] = "Totally Different Co"
    data_r.loc[5, "city"] = np.nan  # NaN path (rlr.py:574 isnan handling)

    pairs = pd.DataFrame(
        {
            "ein": [100, 101, 102, 103, 104, 105, 106, 106, 999],
            "ui_num": [500, 501, 502, 503, 504, 505, 506, 506, 507],
        }
    ).astype("int64")
    # 106/506 duplicated (uniqueness warn-only); 999 absent from dataL
    return data_l, data_r, pairs


VAR_SCHEMA_FIRM = [
    {"name": "Name", "lvars": ["name"], "rvars": ["company_name"]},
    {"name": "Address", "lvars": ["addy_city", "addy_state"], "rvars": ["city", "state"]},
    {"name": "Industry", "lvars": ["sic_code", "sic_text"], "rvars": ["naics", "naics_name"]},
]
