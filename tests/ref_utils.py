"""Helpers to compare computed coefficients against the reference `.ref`
golden fixtures (the MAOOAM ground truths, format
``name[i][j]... =  x.xxxxxE+yy`` — ref ``model_test/test_base.py:17-91``)."""

import pathlib

import numpy as np

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

REAL_EPS = np.finfo(np.float64).eps


def format_entry(symbol, indices, value):
    s = symbol + "".join(f"[{i}]" for i in indices)
    return s + " = % .5E" % value


def collect_entries(symbol, array, offset=0, eps=REAL_EPS):
    """Format all |value| >= eps entries of a dense ndarray, 1-indexed when
    offset=1 (inner products fixtures) or 0-indexed (tensor fixtures)."""
    out = []
    arr = np.asarray(array)
    for idx in zip(*np.nonzero(np.abs(arr) >= eps)):
        out.append(format_entry(symbol, [i + offset for i in idx], arr[idx]))
    return out


def load_ref(filename):
    with open(FIXTURES / filename) as f:
        return [line.rstrip("\n") for line in f]


def compare_to_ref(values, filename, cmax=1):
    """Sort both lists and compare entry-by-entry allowing `cmax` character
    mismatches (last printed digit rounding)."""
    reference = load_ref(filename)
    values = sorted(values, reverse=True)
    reference = sorted(reference, reverse=True)
    assert len(values) == len(reference), \
        f"entry count mismatch: {len(values)} computed vs {len(reference)} reference"
    bad = []
    for v, r in zip(values, reference):
        diff = sum(1 for c1, c2 in zip(v, r) if c1 != c2) + abs(len(v) - len(r))
        if diff > cmax:
            # fall back to numeric comparison — a few legacy fixture entries use
            # a different scientific-notation layout (e.g. -10.000E+00)
            vk, vv = v.split("=")
            rk, rv = r.split("=")
            if vk.strip() != rk.strip() or not np.isclose(float(vv), float(rv),
                                                          rtol=1e-4, atol=1e-300):
                bad.append((v, r))
    assert not bad, "mismatches:\n" + "\n".join(f"{v}  !=  {r}" for v, r in bad[:20])


def compare_to_ref_float(values, filename, rtol=0.0, atol=5e-6):
    """Float-wise comparison (values are printed with 5 decimal digits in the
    fixtures, so atol follows the print precision of the magnitude)."""
    reference = load_ref(filename)
    values = sorted(values, reverse=True)
    reference = sorted(reference, reverse=True)
    assert len(values) == len(reference)
    for v, r in zip(values, reference):
        lv, rv = v.split("="), r.split("=")
        assert lv[0] == rv[0], f"key mismatch {v} vs {r}"
        fv, fr = float(lv[1]), float(rv[1])
        assert np.isclose(fv, fr, rtol=1e-5, atol=atol * max(1.0, abs(fr))), f"{v} != {r}"
