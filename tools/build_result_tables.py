"""One-time converter: package the published FPP result tables as parquet.

The catalog ground-truth tables from the two TRICERATOPS papers
(Giacalone & Dressing tab4/tab5 — 424 classified/unclassified TOIs;
Giacalone et al. 2021 tab7 — 384 TOIs with classifications) are parsed
from their CDS byte-by-byte text format into tidy parquet files bundled
with the framework for catalog-replay validation
(reference data: table_data/tab4.txt, tab5.txt, tab7.txt).

Run from the repo root:
    python tools/build_result_tables.py <path-to-reference-table_data>
"""

import sys
from pathlib import Path

import pandas as pd

OUT_DIR = Path(__file__).resolve().parent.parent / "triceratops_tpu" / "data"


def _parse_cds(path: Path):
    """Parse a CDS byte-by-byte table: returns (colspecs, names, rows)."""
    lines = path.read_text().splitlines()
    # locate the byte-description block between the dashed rules
    dash_idx = [i for i, ln in enumerate(lines) if set(ln.strip()) == {"-"}]
    # dashed rules bracket (header row | byte descriptions | data)
    desc = lines[dash_idx[-2] + 1:dash_idx[-1]]
    colspecs, names = [], []
    for ln in desc:
        # "   1-  7 F7.2   ---     TOI       ..." or "  57- 58 A2 ..."
        try:
            span = ln[:9].replace(" ", "")
            if "-" in span:
                lo, hi = span.split("-")
            else:
                lo = hi = span
            lo, hi = int(lo) - 1, int(hi)
        except ValueError:
            continue
        toks = ln[9:].split()  # [format, units, label, explanation...]
        label = toks[2] if len(toks) > 2 else f"c{len(names)}"
        colspecs.append((lo, hi))
        names.append(label)
    data_start = dash_idx[-1] + 1
    body = "\n".join(lines[data_start:])
    from io import StringIO
    df = pd.read_fwf(StringIO(body), colspecs=colspecs, names=names,
                     header=None)
    return df


def main(table_dir: str) -> None:
    table_dir = Path(table_dir)
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for name in ["tab4", "tab5", "tab7"]:
        src = table_dir / f"{name}.txt"
        if not src.exists():
            print(f"skip {src} (missing)")
            continue
        df = _parse_cds(src)
        out = OUT_DIR / f"catalog_{name}.parquet"
        df.to_parquet(out)
        print(f"wrote {out}: {len(df)} rows, cols={list(df.columns)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/table_data")
