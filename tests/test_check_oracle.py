"""The local oracle harness must be at least as strict as the driver.

Two rounds running (r3 list cells, r4 c6 rounding midpoints) the driver
caught a value difference the local ``%.6g`` float canonicalizer
masked. ``_norm`` now uses ``repr`` (shortest round-trip form) so a
perturbation anywhere in the double's significant digits flips the
value hash — local green predicts driver green.
"""

import importlib.util


def _load():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", "scripts/check_oracle.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_norm_distinguishes_seventh_significant_digit():
    m = _load()
    # The r4 c6 failure class: a 3-digit mean differing at the 6th
    # decimal (7th+ significant digit). "%.6g" rendered both as
    # "749.163"; repr must split them.
    a, b = 749.162945, 749.162935
    assert f"{a:.6g}" == f"{b:.6g}"  # the old canonicalizer's blind spot
    assert m._norm(a) != m._norm(b)


def test_value_hash_flips_on_last_ulp():
    m = _load()
    import math
    v = 0.1 + 0.2            # 0.30000000000000004
    w = 0.3
    assert v != w and math.isclose(v, w)
    h1 = m.value_hash([(v,)], ["x"])
    h2 = m.value_hash([(w,)], ["x"])
    assert h1 != h2


def test_norm_stable_for_equal_values_and_specials():
    m = _load()
    assert m._norm(1.0) == m._norm(1.0)
    assert m._norm(float("nan")) == "nan"
    assert m._norm(None) == "NULL"
    assert m._norm(True) == "1"
    assert m._norm([1.5, None]) == "[" + repr(1.5) + ",NULL]"
