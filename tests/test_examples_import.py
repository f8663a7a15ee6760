"""Examples are importable and their fixture builders work offline."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_example_builders(tmp_path):
    import example_offline as ex

    stars = ex.make_field()
    assert {"ID", "Tmag", "mass", "rad", "Teff", "plx"} <= set(stars.columns)
    tri = ex.make_trilegal(tmp_path / "t.csv")
    assert os.path.exists(tri)
    time, flux, sigma, depth = ex.make_lightcurve(n_t=40)
    assert len(time) == 40 and depth > 0

    import example_contrast_curve as cc

    assert os.path.exists(cc.make_contrast_curve(tmp_path / "cc.csv"))
    assert os.path.exists(cc.make_molusc(tmp_path / "m.csv"))


def test_catalog_example_imports():
    import example_catalog_replay  # noqa: F401
