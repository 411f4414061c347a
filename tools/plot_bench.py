#!/usr/bin/env python3
"""Benchmark plot twin of the reference's utils.py:188-243 (error/speedup
matplotlib charts) and large_scale_plotter.py — dependency-free SVG output
since the bench environment carries no plotting libs.

Usage:
    python3 tools/plot_bench.py <bench_out.json> [sweep.csv] [out_dir]

Reads the one-line JSON emitted by `graft.Bench` (and optionally the
rate-sweep CSV from `graft.bench.SweepBench`) and writes:

    <out_dir>/query_times.svg        per-query median seconds (bar)
    <out_dir>/speedup_probes.svg     every x_*_speedup probe (bar, 1.0 line)
    <out_dir>/error_vs_speedup.svg   sampling error%% vs speedup scatter
                                     (sweep CSV when given, else the x10
                                     accuracy/speedup probes from the JSON)
"""
import csv
import json
import os
import sys

W, H, PAD_L, PAD_B, PAD_T, PAD_R = 960, 520, 170, 60, 40, 30


def esc(s):
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def svg_doc(body, w=W, h=H):
    return (f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" '
            f'height="{h}" font-family="sans-serif" font-size="11">\n'
            f'<rect width="{w}" height="{h}" fill="white"/>\n{body}</svg>\n')


def bar_chart(pairs, title, unit, ref_line=None, log_note=""):
    """Horizontal bars for (label, value) pairs, largest first."""
    pairs = sorted(pairs, key=lambda kv: -kv[1])
    n = len(pairs)
    h = max(220, PAD_T + PAD_B + 18 * n)
    vmax = max((v for _, v in pairs), default=1.0) or 1.0
    span = W - PAD_L - PAD_R
    out = [f'<text x="{W//2}" y="20" text-anchor="middle" '
           f'font-size="14">{esc(title)}</text>']
    if ref_line is not None and 0 < ref_line < vmax:
        x = PAD_L + span * ref_line / vmax
        out.append(f'<line x1="{x:.1f}" y1="{PAD_T}" x2="{x:.1f}" '
                   f'y2="{h-PAD_B}" stroke="#888" stroke-dasharray="4 3"/>')
        out.append(f'<text x="{x:.1f}" y="{h-PAD_B+14}" '
                   f'text-anchor="middle" fill="#555">{ref_line}</text>')
    for i, (k, v) in enumerate(pairs):
        y = PAD_T + 18 * i
        bw = span * max(v, 0.0) / vmax
        color = "#4878a8" if ref_line is None or v >= ref_line else "#c05050"
        out.append(f'<rect x="{PAD_L}" y="{y}" width="{bw:.1f}" height="13" '
                   f'fill="{color}"/>')
        out.append(f'<text x="{PAD_L-6}" y="{y+11}" '
                   f'text-anchor="end">{esc(k)}</text>')
        out.append(f'<text x="{PAD_L+bw+4:.1f}" y="{y+11}">'
                   f'{v:.3g}{unit}</text>')
    if log_note:
        out.append(f'<text x="{PAD_L}" y="{h-8}" fill="#555">'
                   f'{esc(log_note)}</text>')
    return svg_doc("\n".join(out), h=h)


def scatter(points, title, xlabel, ylabel):
    """points: (x, y, label, series). Linear axes from data extent."""
    if not points:
        return svg_doc(f'<text x="20" y="30">{esc(title)}: no data</text>')
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    x0, x1 = min(xs + [0.0]), max(xs) * 1.1 or 1.0
    y0, y1 = min(ys + [0.0]), max(ys) * 1.15 or 1.0
    sx = (W - PAD_L - PAD_R) / (x1 - x0 or 1.0)
    sy = (H - PAD_T - PAD_B) / (y1 - y0 or 1.0)

    def px(x):
        return PAD_L + (x - x0) * sx

    def py(y):
        return H - PAD_B - (y - y0) * sy

    colors = {}
    palette = ["#4878a8", "#c05050", "#50a060", "#a07830", "#7050a0"]
    out = [f'<text x="{W//2}" y="20" text-anchor="middle" '
           f'font-size="14">{esc(title)}</text>',
           f'<line x1="{PAD_L}" y1="{H-PAD_B}" x2="{W-PAD_R}" '
           f'y2="{H-PAD_B}" stroke="black"/>',
           f'<line x1="{PAD_L}" y1="{PAD_T}" x2="{PAD_L}" '
           f'y2="{H-PAD_B}" stroke="black"/>',
           f'<text x="{W//2}" y="{H-12}" text-anchor="middle">'
           f'{esc(xlabel)}</text>',
           f'<text x="18" y="{H//2}" text-anchor="middle" '
           f'transform="rotate(-90 18 {H//2})">{esc(ylabel)}</text>']
    for t in range(6):
        xv = x0 + (x1 - x0) * t / 5
        yv = y0 + (y1 - y0) * t / 5
        out.append(f'<text x="{px(xv):.1f}" y="{H-PAD_B+16}" '
                   f'text-anchor="middle">{xv:.3g}</text>')
        out.append(f'<text x="{PAD_L-6}" y="{py(yv):.1f}" '
                   f'text-anchor="end">{yv:.3g}</text>')
    for x, y, label, series in points:
        c = colors.setdefault(series, palette[len(colors) % len(palette)])
        out.append(f'<circle cx="{px(x):.1f}" cy="{py(y):.1f}" r="5" '
                   f'fill="{c}" fill-opacity="0.8"/>')
        if label:
            out.append(f'<text x="{px(x)+7:.1f}" y="{py(y)-5:.1f}" '
                       f'fill="#333">{esc(label)}</text>')
    for i, (series, c) in enumerate(colors.items()):
        out.append(f'<circle cx="{W-PAD_R-150}" cy="{PAD_T+16*i}" r="5" '
                   f'fill="{c}"/>')
        out.append(f'<text x="{W-PAD_R-140}" y="{PAD_T+16*i+4}">'
                   f'{esc(series)}</text>')
    return svg_doc("\n".join(out))


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    bench_path = sys.argv[1]
    sweep_path = sys.argv[2] if len(sys.argv) > 2 and \
        sys.argv[2].endswith(".csv") else None
    out_dir = (sys.argv[3] if len(sys.argv) > 3
               else (sys.argv[2] if len(sys.argv) > 2 and not sweep_path
                     else "bench_plots"))
    os.makedirs(out_dir, exist_ok=True)
    with open(bench_path) as f:
        raw = f.read().strip()
    try:
        bench = json.loads(raw)
    except json.JSONDecodeError:
        # bench_out.json may carry log noise before the JSON line
        bench = json.loads(raw.splitlines()[-1])
    if "parsed" in bench and isinstance(bench["parsed"], dict):
        bench = bench["parsed"]  # driver's BENCH_r{N}.json wrapper
    q = bench.get("queries", {})

    times = [(k, v) for k, v in q.items()
             if not k.startswith("x") and v >= 0]
    with open(os.path.join(out_dir, "query_times.svg"), "w") as f:
        f.write(bar_chart(times, f'per-query median seconds '
                          f'(sf={bench.get("sf", "?")})', " s"))

    speedups = [(k, v) for k, v in q.items()
                if k.endswith("_speedup") and v >= 0] + \
               [(k, v) for k, v in q.items()
                if k.endswith("speedup_sys") or k.endswith("speedup_file")]
    with open(os.path.join(out_dir, "speedup_probes.svg"), "w") as f:
        f.write(bar_chart(speedups, "speedup probes (ratio vs plain plan)",
                          "x", ref_line=1.0,
                          log_note="bars left of 1.0 mean the optimized "
                          "plan lost at this scale (see PLANS.md for "
                          "which are overhead-bound)"))

    points = []
    if sweep_path and os.path.exists(sweep_path):
        with open(sweep_path) as f:
            for row in csv.DictReader(f):
                try:
                    points.append((float(row["speedup_vs_exact"]),
                                   float(row["error_pct"]),
                                   f'{row["sample_pct"]}%',
                                   row["design"]))
                except (KeyError, ValueError):
                    continue
        title = "sampling error vs speedup (rate sweep)"
    else:
        for design, acc_k, sp_k in [
                ("systematic", "x10_sys10_accuracy_pct", "x10_speedup_sys"),
                ("file-level", "x10_file10_accuracy_pct", "x10_speedup_file")]:
            if acc_k in q and sp_k in q:
                points.append((q[sp_k], 100.0 - q[acc_k], "10%", design))
        title = "sampling error vs speedup (10% probes)"
    with open(os.path.join(out_dir, "error_vs_speedup.svg"), "w") as f:
        f.write(scatter(points, title, "speedup vs exact (x)", "error (%)"))

    print(f"wrote {out_dir}/query_times.svg, speedup_probes.svg, "
          f"error_vs_speedup.svg")
    return 0


if __name__ == "__main__":
    sys.exit(main())
