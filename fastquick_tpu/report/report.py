"""Final QC report: plots + single-file HTML.

R-free equivalent of the reference's visualization stage
(bin/RPlotScript.R:138-322 panels + bin/FinalReport.rmd): depth
distribution, empirical quality/cycle distributions, GC bias, raw +
adjusted insert-size distributions, the summary table, and the PC1/PC2
ancestry scatter against the reference-panel sample coordinates
(resource/1000g.pop population labels + the SVD .V matrix).
"""

from __future__ import annotations

import base64
import io
import os

import numpy as np

from ..params import ParamList
from ..utils.logging import error, notice


def _load_2col(path: str):
    xs, ys = [], []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                xs.append(float(parts[0]))
                ys.append(float(parts[1]))
    return np.array(xs), np.array(ys)


def _fig_to_b64(fig) -> str:
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=110, bbox_inches="tight")
    import matplotlib.pyplot as plt

    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


def generate_report(prefix: str, svd_prefix: str | None = None,
                    pop_path: str | None = None,
                    out_path: str | None = None) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels: list[tuple[str, str]] = []

    # Depth distribution
    if os.path.exists(prefix + ".DepthDist"):
        x, y = _load_2col(prefix + ".DepthDist")
        fig, ax = plt.subplots(figsize=(6, 3.5))
        hi = 30
        ax.bar(x[1:hi], y[1:hi], color="#4878d0")
        ax.set_xlabel("Depth")
        ax.set_ylabel("Number of positions")
        ax.set_title("Depth distribution (depth >= 1)")
        panels.append(("Depth Distribution", _fig_to_b64(fig)))

    # Empirical quality (EmpRepDist: qual, mis, total, empQ)
    if os.path.exists(prefix + ".EmpRepDist"):
        rows = np.loadtxt(prefix + ".EmpRepDist")
        mask = rows[:, 2] > 0
        fig, ax = plt.subplots(figsize=(6, 3.5))
        ax.plot(rows[mask, 0], rows[mask, 3], "o-", color="#4878d0",
                label="Empirical")
        ax.plot(rows[mask, 0], rows[mask, 0], "--", color="#999999",
                label="Reported")
        ax.set_xlabel("Reported base quality")
        ax.set_ylabel("Empirical quality")
        ax.legend()
        ax.set_title("Empirical vs reported base quality")
        panels.append(("Empirical Quality", _fig_to_b64(fig)))

    # Empirical per-cycle quality
    if os.path.exists(prefix + ".EmpCycleDist"):
        rows = np.loadtxt(prefix + ".EmpCycleDist")
        mask = rows[:, 2] > 0
        fig, ax = plt.subplots(figsize=(6, 3.5))
        ax.plot(rows[mask, 0], rows[mask, 3], "-", color="#d65f5f")
        ax.set_xlabel("Sequencing cycle")
        ax.set_ylabel("Empirical quality")
        ax.set_title("Per-cycle empirical quality")
        panels.append(("Per-cycle Quality", _fig_to_b64(fig)))

    # GC bias (GCDist: gc, depth_sum, n_pos, normalized)
    if os.path.exists(prefix + ".GCDist"):
        rows = np.loadtxt(prefix + ".GCDist")
        mask = rows[:, 2] > 0
        fig, ax = plt.subplots(figsize=(6, 3.5))
        ax.plot(rows[mask, 0], rows[mask, 3], "o-", color="#6acc64",
                markersize=3)
        ax.axhline(1.0, color="#999999", linestyle="--")
        ax.set_xlabel("GC content (%)")
        ax.set_ylabel("Normalized depth")
        ax.set_title("GC bias")
        panels.append(("GC Bias", _fig_to_b64(fig)))

    # Insert size
    if os.path.exists(prefix + ".AdjustedInsertSizeDist"):
        xa, ya = _load_2col(prefix + ".AdjustedInsertSizeDist")
        fig, ax = plt.subplots(figsize=(6, 3.5))
        ax.plot(xa[:1000], ya[:1000], "-", color="#4878d0", label="Adjusted")
        if os.path.exists(prefix + ".RawInsertSizeDist"):
            xr, yr = _load_2col(prefix + ".RawInsertSizeDist")
            tot = yr.sum() or 1
            ax.plot(xr[:1000], yr[:1000] / tot, "-", color="#d65f5f",
                    alpha=0.7, label="Raw (normalized)")
        ax.set_xlabel("Insert size")
        ax.set_ylabel("Density")
        ax.legend()
        ax.set_title("Insert size distribution")
        panels.append(("Insert Size", _fig_to_b64(fig)))

    # Ancestry PC scatter
    anc = prefix + ".Ancestry"
    if os.path.exists(anc) and svd_prefix:
        vpath = svd_prefix + ".V"
        if os.path.exists(vpath):
            pops: dict[str, str] = {}
            if pop_path and os.path.exists(pop_path):
                with open(pop_path) as fh:
                    for line in fh:
                        p = line.split()
                        if len(p) >= 2:
                            pops[p[0]] = p[1]
            xs, ys, labels = [], [], []
            with open(vpath) as fh:
                for line in fh:
                    p = line.split()
                    if len(p) >= 3:
                        xs.append(float(p[1]))
                        ys.append(float(p[2]))
                        labels.append(pops.get(p[0], "REF"))
            pcs = []
            with open(anc) as fh:
                fh.readline()
                for line in fh:
                    p = line.split()
                    if len(p) >= 3:
                        pcs.append((float(p[1]), float(p[2])))
            fig, ax = plt.subplots(figsize=(6, 5))
            uniq = sorted(set(labels))
            cmap = plt.get_cmap("tab20")
            for ui, u in enumerate(uniq):
                idx = [i for i, l in enumerate(labels) if l == u]
                ax.scatter([xs[i] for i in idx], [ys[i] for i in idx], s=6,
                           alpha=0.5, color=cmap(ui % 20), label=u)
            if len(pcs) >= 2:
                ax.scatter([pcs[0][1]], [pcs[1][1]], s=140, marker="*",
                           color="black", label="Intended", zorder=5)
                ax.scatter([pcs[0][0]], [pcs[1][0]], s=140, marker="X",
                           color="red", label="Contaminating", zorder=5)
            ax.set_xlabel("PC1")
            ax.set_ylabel("PC2")
            ax.legend(fontsize=6, ncol=2)
            ax.set_title("Genetic ancestry (reference panel PCs)")
            panels.append(("Ancestry", _fig_to_b64(fig)))

    # Summary table(s)
    summary_rows = []
    if os.path.exists(prefix + ".Summary"):
        with open(prefix + ".Summary") as fh:
            for line in fh:
                if ":" in line:
                    k, v = line.split(":", 1)
                    summary_rows.append((k.strip(), v.strip()))

    html = ["<!DOCTYPE html><html><head><meta charset='utf-8'>",
            "<title>FASTQuick-TPU QC Report</title>",
            "<style>body{font-family:sans-serif;max-width:900px;margin:auto}"
            "table{border-collapse:collapse}td,th{border:1px solid #ccc;"
            "padding:4px 10px}h2{margin-top:2em}</style></head><body>",
            "<h1>FASTQuick-TPU QC Report</h1>",
            f"<p>Prefix: <code>{os.path.basename(prefix)}</code></p>"]
    if summary_rows:
        html.append("<h2>Summary</h2><table>")
        for k, v in summary_rows:
            html.append(f"<tr><td>{k}</td><td>{v}</td></tr>")
        html.append("</table>")
    for title, b64 in panels:
        html.append(f"<h2>{title}</h2><img src='data:image/png;base64,{b64}'/>")
    html.append("</body></html>")

    out = out_path or prefix + ".FinalReport.html"
    with open(out, "w") as fh:
        fh.write("\n".join(html))
    notice("Report written to %s (%d panels)", out, len(panels))
    return out


def run_report(argv: list[str]) -> int:
    pl = ParamList()
    pl.add("in_prefix", "Empty", "prefix of the align/pop+con outputs")
    pl.add("SVDPrefix", "Empty", "SVD prefix (for the ancestry panel)")
    pl.add("PopLabels", "Empty", "sample->population label file (1000g.pop)")
    pl.add("out", "Empty", "output HTML path")
    pl.read(argv)
    if pl["in_prefix"] == "Empty":
        error("--in_prefix is required")
    generate_report(
        pl["in_prefix"],
        svd_prefix=None if pl["SVDPrefix"] == "Empty" else pl["SVDPrefix"],
        pop_path=None if pl["PopLabels"] == "Empty" else pl["PopLabels"],
        out_path=None if pl["out"] == "Empty" else pl["out"])
    return 0
