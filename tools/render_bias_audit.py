"""Render bias_audit.py JSON results as a markdown table for
docs/parity.md.

Usage:  python tools/render_bias_audit.py /tmp/bias_audit.json
"""

import json
import sys


def render(path):
    with open(path) as f:
        results = json.load(f)
    out = []
    for r in results:
        out.append(f"**{r['target']}** — IS N={r['N_is']:.0e} vs plain "
                   f"rejection N={r['N_plain']:.0e}, {r['K']} keys each:")
        out.append("")
        out.append("| scenario | IS mean lnZ (±2 s.e.) | plain mean lnZ "
                   "(±2 s.e.) | Δmean | overlap |")
        out.append("|---|---|---|---|---|")
        for s in r["scenarios"]:
            if "is_mean" not in s:
                out.append(f"| {s['scenario']} | (−inf runs: "
                           f"{s.get('finite_is', 0)}/{s.get('finite_plain', 0)}"
                           " finite) | | | |")
                continue
            out.append(
                f"| {s['scenario']} | {s['is_mean']:.3f} ± {s['is_2se']:.3f}"
                f" | {s['plain_mean']:.3f} ± {s['plain_2se']:.3f}"
                f" | {s['dmean']:+.3f} | {'yes' if s['overlap'] else 'NO'} |")
        fi, fp = r["fpp_is"], r["fpp_plain"]
        out.append("")
        out.append(f"FPP: IS {fi['mean']:.4g} ± {fi['std']:.4g} vs plain "
                   f"{fp['mean']:.4g} ± {fp['std']:.4g}")
        out.append("")
    return "\n".join(out)


if __name__ == "__main__":
    print(render(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bias_audit.json"))
