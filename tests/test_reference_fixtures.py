"""Parity against the reference's OWN golden fixtures (read directly
from /root/reference, untouched): the smoker.html pinned-metadata
matrix (fetch/trafilatura/fetcher_test.go:113-178) and the real-world
ars-2003724 capture (internal/test_support/ars-2003724.{html,json},
exercised by internal/scrape_test.go:31-140).

Every metadata field must match byte-identically. content_text is
byte-identical on smoker; on ars our spec'd extractor confines the
body to the page's declared schema.org articleBody rather than
reproducing go-trafilatura's statistical scorer (SURVEY.md §7.4.1) —
asserted as: reference content is (near-)contained in ours.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import pytest

from scrape_ray.stages.extract import extract_page

REF = "/root/reference"
SMOKER = f"{REF}/fetch/trafilatura/smoker.html"
ARS_HTML = f"{REF}/internal/test_support/ars-2003724.html"
ARS_JSON = f"{REF}/internal/test_support/ars-2003724.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SMOKER), reason="reference checkout not present"
)


def test_smoker_fixture_byte_identical():
    """Every field TestMetadataPopulatedSmokeTest pins
    (fetcher_test.go:137-177), including exact content_text."""
    with open(SMOKER, "rb") as f:
        html = f.read()
    out = extract_page(html, "http://ts/0e35649e7413c52ee4502525b548c645.html")
    assert out["error"] is None
    assert out["title"] == "Smoke Test"
    assert out["authors"] == ["Joe Blow"]
    assert out["description"] == "This is a smoke test"
    assert out["language"] == "en"
    assert out["tags"] == ["test", "smoke"]
    assert out["categories"] == ["Cat1", "Cat2"]
    assert out["page_type"] == "article"
    assert out["date"] == datetime(2024, 1, 1)
    assert out["sitename"] == "smoke.scrape"
    assert out["url"] == "http://smoke.scrape"  # og:url → canonical
    assert out["image"] == "https://smoke.scrape/image.png"
    assert (
        out["content_text"]
        == "Smoke Test This body is in english, it should be detected as such."
    )


def test_ars_fixture_metadata_byte_identical():
    """The real-world golden capture: all metadata fields must equal
    the reference's recorded JSON byte-for-byte."""
    with open(ARS_HTML, "rb") as f:
        html = f.read()
    with open(ARS_JSON) as f:
        exp = json.load(f)
    out = extract_page(html, exp["requested_url"])
    assert out["error"] is None
    assert out["title"] == exp["title"]  # og:title, no " | Ars Technica"
    assert out["authors"] == exp["authors"]  # itemprop author/name microdata
    assert out["description"] == exp["description"]
    assert out["language"] == exp["language"]
    assert out["image"] == exp["image"]
    assert out["page_type"] == exp["page_type"]
    assert out["sitename"] == exp["sitename"]
    assert out["url"] == exp["url"]  # link rel=canonical
    assert out["hostname"] == exp["hostname"]
    # reference pins 2024-02-15T00:00:00Z though the page publishes
    # 22:00:17 — trafilatura extracts dates, not datetimes
    assert out["date"] == datetime(2024, 2, 15)


def test_ars_fixture_content_confined_to_article_body():
    """Our body = the page's declared articleBody (title-prefixed,
    whitespace-normalized). go-trafilatura's scorer keeps a strict
    subset of those paragraphs; every sentence it kept must appear in
    ours, and boilerplate outside articleBody must not leak in."""
    with open(ARS_HTML, "rb") as f:
        html = f.read()
    with open(ARS_JSON) as f:
        exp = json.load(f)
    out = extract_page(html, exp["requested_url"])
    ours = out["content_text"]
    assert ours.startswith(exp["title"])
    # nav/menu boilerplate outside articleBody is excluded
    assert "Skip to main content" not in ours
    assert "Sign up or login" not in ours
    # the reference's scored extraction is contained in our
    # articleBody text (module whitespace): check sentence containment
    ref_sentences = [
        s.strip()
        for s in exp["content_text"].split(". ")
        if len(s.strip()) > 40
    ]
    missing = [s for s in ref_sentences if s not in ours]
    assert not missing, f"reference sentences missing from ours: {missing[:2]}"
