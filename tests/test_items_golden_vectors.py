"""Golden-vector gates for the generic-items sampling wire formats:
VarOpt sketch/union, Reservoir items sketch/union (long/double/string
SerDes), and the frequent-items STRING sketch — decoded from the
reference's own Java/C++/Go serialized files, asserting the same
invariants as the reference's compat tests
(sampling/varopt_items_sketch_serialization_test.go:95-180,
sampling/reservoir_items_sketch_serialization_test.go:300-345,
frequencies/sketch_serialization_test.go:171-266)."""

import glob
import os

import pytest

VEC = "/root/reference/serialization_test_data"
LANGS = ["java", "cpp", "go"]
EPS = 1e-13  # the reference's varOptItemsSerializationEpsilon


def _files(pattern):
    out = sorted(glob.glob(f"{VEC}/*_generated_files/{pattern}"))
    assert out, f"no golden vectors match {pattern}"
    return out


# --------------------------------------------------------------------------
# VarOpt
# --------------------------------------------------------------------------

@pytest.mark.parametrize("n", [0, 1, 10, 100, 1000, 10000, 100000, 1000000])
def test_varopt_long_vectors(n):
    from sparkdedup.sketch_io.items_decoder import decode_varopt_sketch

    for path in _files(f"varopt_sketch_long_n{n}_*.sk"):
        img = decode_varopt_sketch(open(path, "rb").read(), "long")
        assert img.is_empty == (n == 0), path
        assert img.k == 32, path
        assert img.n == n, path
        assert img.num_samples == (32 if n > 10 else n), path
        # unit weights: the all-items subset sum estimates the stream size
        assert img.estimate_subset_sum(lambda _: True) == pytest.approx(
            float(n), abs=EPS), path
        assert img.total_weight == pytest.approx(float(n), abs=EPS), path


def test_varopt_string_exact_vectors():
    from sparkdedup.sketch_io.items_decoder import decode_varopt_sketch

    want = sum(1000.0 / i for i in range(1, 201))
    for path in _files("varopt_sketch_string_exact_*.sk"):
        img = decode_varopt_sketch(open(path, "rb").read(), "string")
        assert not img.is_empty
        assert img.k == 1024 and img.n == 200 and img.num_samples == 200
        assert img.estimate_subset_sum(lambda _: True) == pytest.approx(
            want, abs=EPS), path
        assert img.total_weight == pytest.approx(want, abs=EPS), path
        assert all(isinstance(s, str) for s in img.items_h)


def test_varopt_long_sampling_vectors():
    from sparkdedup.sketch_io.items_decoder import decode_varopt_sketch

    for path in _files("varopt_sketch_long_sampling_*.sk"):
        img = decode_varopt_sketch(open(path, "rb").read(), "long")
        assert img.k == 1024 and img.n == 2003
        assert img.num_samples == img.k
        assert img.estimate_subset_sum(lambda _: True) == pytest.approx(
            332000.0, abs=EPS), path
        assert img.estimate_subset_sum(lambda x: x < 0) == pytest.approx(
            330000.0, abs=EPS), path
        assert img.estimate_subset_sum(lambda x: x >= 0) == pytest.approx(
            2000.0, abs=EPS), path


def test_varopt_union_double_sampling_vectors():
    from sparkdedup.sketch_io.items_decoder import (decode_varopt_sketch,
                                                    decode_varopt_union)

    for path in _files("varopt_union_double_sampling_*.sk"):
        data = open(path, "rb").read()
        if data[2] == 14:
            # java/cpp: a real union wrapper (n=97: a k=16 sampling sketch
            # with one heavy item unioned with a 64-item unit stream)
            u = decode_varopt_union(data, "double")
            assert u.n == 97 and u.gadget is not None, path
            g = u.gadget
            # one heavy item (weight 1024) among 96 unit-weight lights.
            # NOTE: asserted on the RAW stored gadget weights — the
            # reference test asserts on union.Result(), which reconciles
            # weights against the outer tau; the raw weights carry ~1e-12
            # of downsampling FP noise (cpp), so the tolerance is looser
            # than the reference's post-Result epsilon.
            assert g.total_weight == pytest.approx(96.0 + 1024.0,
                                                   abs=1e-9), path
            assert g.estimate_subset_sum(lambda x: x >= 0) == pytest.approx(
                96.0, abs=1e-9), path
        else:
            # the reference's own Go generator writes the second SKETCH
            # (k=16, 64 unit-weight items), not the union wrapper —
            # varopt_items_union_serialization_test.go:69
            g = decode_varopt_sketch(data, "double")
            assert g.k == 16 and g.n == 64, path
            assert g.num_samples == 16, path
            assert g.total_weight == pytest.approx(64.0, abs=EPS), path


# --------------------------------------------------------------------------
# Reservoir items (long / double / string SerDes)
# --------------------------------------------------------------------------

_UNIVERSE = {
    "long": lambda i: i,
    "double": lambda i: float(i),
    "string": lambda i: f"item{i}",
}


@pytest.mark.parametrize("typ", ["long", "double", "string"])
def test_reservoir_items_vectors(typ):
    from sparkdedup.sketch_io.items_decoder import decode_reservoir_items

    mk = _UNIVERSE[typ]
    for path in _files(f"reservoir_items_{typ}_empty_k128_*.sk"):
        img = decode_reservoir_items(open(path, "rb").read(), typ)
        assert img.is_empty and img.k == 128 and img.samples == [], path
    for n in [1, 10, 32, 100, 128]:
        for path in _files(f"reservoir_items_{typ}_exact_n{n}_k128_*.sk"):
            img = decode_reservoir_items(open(path, "rb").read(), typ)
            assert img.k == 128 and img.n == n, path
            # exact mode: the sample IS the stream, in insertion order
            assert img.samples == [mk(i) for i in range(n)], path
    for k in [32, 64, 128]:
        for path in _files(f"reservoir_items_{typ}_sampling_n1000_k{k}_*.sk"):
            img = decode_reservoir_items(open(path, "rb").read(), typ)
            assert img.k == k and img.n == 1000, path
            assert len(img.samples) == k, path
            universe = {mk(i) for i in range(1000)}
            got = set(img.samples)
            assert len(got) == k, path          # without replacement
            assert got <= universe, path


@pytest.mark.parametrize("typ", ["long", "double", "string"])
def test_reservoir_items_union_vectors(typ):
    from sparkdedup.sketch_io.items_decoder import (
        decode_reservoir_items_union)

    mk = _UNIVERSE[typ]
    for path in _files(f"reservoir_items_union_{typ}_empty_maxk128_*.sk"):
        u = decode_reservoir_items_union(open(path, "rb").read(), typ)
        assert u.max_k == 128 and u.gadget is None, path
    for n in [1, 10, 32, 100, 128]:
        for path in _files(
                f"reservoir_items_union_{typ}_exact_n{n}_maxk128_*.sk"):
            u = decode_reservoir_items_union(open(path, "rb").read(), typ)
            assert u.max_k == 128 and u.gadget is not None, path
            assert u.gadget.n == n, path
            assert set(u.gadget.samples) == {mk(i) for i in range(n)}, path
    for k in [32, 64, 128]:
        for path in _files(
                f"reservoir_items_union_{typ}_sampling_n1000_maxk{k}_*.sk"):
            u = decode_reservoir_items_union(open(path, "rb").read(), typ)
            assert u.max_k == k and u.gadget is not None, path
            g = u.gadget
            assert g.n == 1000 and len(g.samples) == k, path
            assert set(g.samples) <= {mk(i) for i in range(1000)}, path


# --------------------------------------------------------------------------
# Frequent items, string SerDe
# --------------------------------------------------------------------------

@pytest.mark.parametrize("n", [0, 1, 10, 100, 1000, 10000, 100000, 1000000])
def test_frequent_string_n_vectors(n):
    from sparkdedup.sketch_io.frequencies_decoder import (
        decode_freq_string_sketch)

    for path in _files(f"frequent_string_n{n}_*.sk"):
        img = decode_freq_string_sketch(open(path, "rb").read())
        assert img.stream_weight == n, path
        if n > 10:
            assert img.maximum_error > 0, path
        else:
            assert img.maximum_error == 0, path
        assert len(img.items) == len(img.counts)


def test_frequent_string_utf8_vectors():
    from sparkdedup.sketch_io.frequencies_decoder import (
        decode_freq_string_sketch)

    words = ["абвгд", "еёжзи", "йклмн", "опрст", "уфхцч", "шщъыь", "эюя"]
    for path in _files("frequent_string_utf8_*.sk"):
        img = decode_freq_string_sketch(open(path, "rb").read())
        assert img.stream_weight == 28 and img.maximum_error == 0, path
        for i, w in enumerate(words, start=1):
            assert img.estimate(w) == i, (path, w)


def test_frequent_string_ascii_vectors():
    from sparkdedup.sketch_io.frequencies_decoder import (
        decode_freq_string_sketch)

    for path in _files("frequent_string_ascii_*.sk"):
        img = decode_freq_string_sketch(open(path, "rb").read())
        assert img.stream_weight == 10 and img.maximum_error == 0, path
        for i, ch in enumerate("abcd", start=1):
            assert img.estimate(ch * 29) == i, (path, ch)
