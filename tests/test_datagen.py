from rlr_spark.datagen import generate_web_pages, render_html


def test_deterministic():
    a, ta = generate_web_pages(200, seed=42)
    b, tb = generate_web_pages(200, seed=42)
    assert a.equals(b)
    assert ta.equals(tb)


def test_shape_and_schema():
    pages, truth = generate_web_pages(200, seed=42)
    assert list(pages.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert len(pages) == 200
    assert pages["url"].is_unique
    assert set(truth.columns) == {"url", "entity_id"}
    assert truth["entity_id"].min() == 0


def test_planted_clusters_exist():
    pages, truth = generate_web_pages(500, seed=42)
    sizes = truth.groupby("entity_id").size()
    assert (sizes > 1).sum() > 20  # real duplicate clusters planted
    assert (sizes == 1).sum() > 100  # and singletons


def test_mega_domain_skew():
    pages, _ = generate_web_pages(1000, seed=42)
    domains = pages["url"].str.extract(r"https://([^/]+)/")[0]
    mega_share = (domains == "mega-site.com").mean()
    assert 0.2 < mega_share < 0.4


def test_html_wraps_text_exactly():
    pages, _ = generate_web_pages(50, seed=42)
    row = pages.iloc[0]
    assert row["text"].encode("utf-8") in row["html"]
    assert render_html("Page 0", row["text"]) == row["html"]
