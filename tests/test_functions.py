"""Unit tests: url normalization, hashing, pinned extraction."""

import numpy as np
import pytest

from imtag_ray.functions.urls import hash64, hash64_array, host_of, normalize_url
from imtag_ray.stages.extract import extract_hrefs, extract_links, extract_text


class TestNormalizeUrl:
    def test_absolute(self):
        assert (
            normalize_url("https://a.ex/", "https://b.ex/p?q=1#f")
            == "https://b.ex/p?q=1"
        )

    def test_relative(self):
        assert normalize_url("https://a.ex/x/y", "../z") == "https://a.ex/z"
        assert normalize_url("https://a.ex/x/y", "/root") == "https://a.ex/root"
        assert normalize_url("https://a.ex/x/", "sib") == "https://a.ex/x/sib"

    def test_case_and_ports(self):
        assert normalize_url("https://a.ex/", "HTTPS://B.EX:443/P") == "https://b.ex/P"
        assert normalize_url("https://a.ex/", "http://b.ex:80/") == "http://b.ex/"
        assert normalize_url("https://a.ex/", "http://b.ex:8080/") == "http://b.ex:8080/"

    def test_rejects(self):
        assert normalize_url("https://a.ex/", "mailto:x@y.z") is None
        assert normalize_url("https://a.ex/", "javascript:void(0)") is None
        assert normalize_url("https://a.ex/", "#frag-only") is None
        assert normalize_url("https://a.ex/", "") is None

    def test_empty_path(self):
        assert normalize_url("https://a.ex/p", "https://b.ex") == "https://b.ex/"

    def test_host_of(self):
        assert host_of("https://B.Ex:8080/p") == "b.ex"
        assert host_of("not a url") == ""


class TestHash64:
    def test_known_fnv_vector(self):
        # FNV-1a 64-bit of "abc" (public test vector)
        assert hash64("abc") == 0xE71FA2190541574B

    def test_vectorized_matches_scalar(self):
        strings = ["", "a", "abc", "https://site0.example/p0", "ünïcødé" * 3]
        vec = hash64_array(strings)
        assert list(vec) == [hash64(s) for s in strings]

    def test_dtype(self):
        assert hash64_array(["x"]).dtype == np.uint64


class TestExtract:
    HTML = (
        b"<html><head><title>T</title><style>a{color:red}</style></head>"
        b"<body><h1>Hi &amp; lo</h1><script>var x=1;</script><!-- c -->"
        b'<p>Body  text</p><a href="/p2">x</a>'
        b"<a HREF='https://B.ex/p#f'>y</a>"
        b'<a href=bare>z</a><a href="mailto:no">m</a></body></html>'
    )

    def test_text_pinned(self):
        assert extract_text(self.HTML) == "T Hi & lo Body text x y z m"

    def test_text_empty(self):
        assert extract_text(b"") == ""

    def test_hrefs_document_order(self):
        assert extract_hrefs(self.HTML) == [
            "/p2",
            "https://B.ex/p#f",
            "bare",
            "mailto:no",
        ]

    def test_links_normalized_self_dropped(self):
        links = extract_links("https://a.ex/p1", self.HTML)
        assert links == [
            "https://a.ex/p2",
            "https://b.ex/p",
            "https://a.ex/bare",
        ]
        assert extract_links("https://a.ex/p2", self.HTML) == [
            "https://b.ex/p",
            "https://a.ex/bare",
        ]  # self-link dropped
