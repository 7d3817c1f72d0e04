"""Suffix-array / LCP / LCS correctness vs brute force."""

import numpy as np
import pytest

from sparkdedup.functions.suffix import (
    containment_fraction,
    lcp_array,
    longest_common_substring,
    suffix_array,
)


@pytest.mark.parametrize("trial", range(15))
def test_suffix_array_matches_bruteforce(trial):
    rng = np.random.default_rng(trial)
    n = int(rng.integers(1, 80))
    s = bytes(rng.integers(97, 101, n, dtype=np.uint8))
    sa = suffix_array(s)
    assert list(sa) == sorted(range(n), key=lambda i: s[i:])


def test_lcp_matches_bruteforce():
    rng = np.random.default_rng(99)
    s = bytes(rng.integers(97, 100, 60, dtype=np.uint8))
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    for i in range(1, len(s)):
        x, y = s[sa[i]:], s[sa[i - 1]:]
        m = 0
        while m < min(len(x), len(y)) and x[m] == y[m]:
            m += 1
        assert lcp[i] == m


def _brute_lcs(a, b):
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


@pytest.mark.parametrize("trial", range(20))
def test_lcs_matches_bruteforce(trial):
    rng = np.random.default_rng(1000 + trial)
    a = bytes(rng.integers(97, 100, int(rng.integers(1, 50)), dtype=np.uint8))
    b = bytes(rng.integers(97, 100, int(rng.integers(1, 50)), dtype=np.uint8))
    assert longest_common_substring(a, b) == _brute_lcs(a, b)


def test_containment_fraction():
    assert containment_fraction("hello world", "xx hello world yy") == 1.0
    assert containment_fraction("abc", "xyz") == 0.0
    assert containment_fraction("", "xyz") == 0.0
    assert 0.0 < containment_fraction("abcdef", "zzabczz") < 1.0
