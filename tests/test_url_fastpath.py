"""Property test: the normalize_url fast path is invisible — identical
output to the pure RFC-3986 slow path for arbitrary hrefs."""

from urllib.parse import urljoin, urlsplit, urlunsplit

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from imtag_ray.functions.urls import _DEFAULT_PORTS, normalize_url


def slow_normalize(base: str, href: str):
    """Frozen copy of the pre-fast-path implementation (the spec)."""
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    try:
        resolved = urljoin(base, href)
        parts = urlsplit(resolved)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    default = _DEFAULT_PORTS[scheme]
    if netloc.endswith(default):
        netloc = netloc[: -len(default)]
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


hosts = st.from_regex(r"[a-zA-Z0-9][a-zA-Z0-9.\-]{0,20}", fullmatch=True)
paths = st.from_regex(r"(/[a-zA-Z0-9._~%\-]{0,8}){0,4}/?", fullmatch=True)
queries = st.one_of(st.just(""), st.from_regex(r"\?[a-zA-Z0-9=&./]{0,12}", fullmatch=True))
frags = st.one_of(st.just(""), st.from_regex(r"#[a-zA-Z0-9]{0,6}", fullmatch=True))
schemes = st.sampled_from(["http", "https", "HTTP", "Https", "ftp", "mailto"])
ports = st.one_of(st.just(""), st.sampled_from([":80", ":443", ":8080", ":0"]))


@st.composite
def absolute_urls(draw):
    return (
        draw(schemes) + "://" + draw(hosts) + draw(ports)
        + draw(paths) + draw(queries) + draw(frags)
    )


rel_refs = st.one_of(
    paths,
    st.from_regex(r"\.\./[a-zA-Z0-9/.]{0,10}", fullmatch=True),
    st.from_regex(r"[a-zA-Z0-9._\-]{1,10}", fullmatch=True),
    frags,
    st.just(""),
)


@settings(max_examples=500, deadline=None, derandomize=True)
@given(href=st.one_of(absolute_urls(), rel_refs))
def test_fast_path_equals_slow_path(href):
    base = "https://site3.example/dir/page"
    assert normalize_url(base, href) == slow_normalize(base, href)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(href=st.text(min_size=0, max_size=40))
def test_fast_path_on_garbage(href):
    base = "https://b.example/x"
    assert normalize_url(base, href) == slow_normalize(base, href)


def test_fast_path_known_cases():
    base = "https://a.ex/p"
    cases = [
        "https://b.ex/path?q=1",          # fast
        "https://b.ex",                    # fast, path fill
        "https://b.ex:8080/x",             # fast, explicit port
        "https://b.ex:443/x",              # slow (default port strip)
        "HTTPS://B.EX/x",                  # slow (case)
        "https://b.ex/a/../b",             # slow (dot segments)
        "https://b.ex/a/..c",              # fast ('..c' is not a dot segment)
        "https://b.ex/?q=/../x",           # fast (dots only in query)
        "https://b.ex/#f",                 # slow (fragment)
        "https://user@b.ex/x",             # slow (userinfo)
    ]
    for href in cases:
        assert normalize_url(base, href) == slow_normalize(base, href), href
