"""Published-catalog accessors (repackaged table_data ground truth)."""

from triceratops_tpu.populations import catalogs


class TestCatalogs:
    def test_vetting_catalog(self):
        df = catalogs.vetting_catalog()
        assert len(df) >= 384
        assert {"TICID", "TOI", "Rp", "Porb", "FPP", "NFPP",
                "Classification"} <= set(df.columns)
        assert df["Classification"].str.contains("Likely Planet").any()

    def test_classified(self):
        df = catalogs.classified_tois()
        assert {"TOI", "FPP-2m", "FPP-30m", "TFOPdisp"} <= set(df.columns)
        assert len(df) > 200
        fpp = df["FPP-2m"].dropna().astype(float)
        assert ((fpp >= 0) & (fpp <= 1)).all()

    def test_unclassified(self):
        df = catalogs.unclassified_tois()
        assert len(df) >= 400
        assert {"TOI", "FPP", "Rp"} <= set(df.columns)
