"""Plotting: matplotlib equivalents of the reference's R/ggplot2 outputs.

  * plot_top_sites — per-site window plots of the two groups' signal
    distributions (violin or mirrored density) with log10 p-value tracks
    (ref bin/scripts/Rscript/Base_Most_Significant_Plot.R, driven by
    myDetect.mboxplot/plot1 :129-299)
  * plot_rank_histogram — stacked rank-percentile fractions per sweep value
    (ref Rscript/Hist_sim_plot*.R, driven by mySimulate.mplotHis :519-541)

Plots are not perf-critical; everything here is host-side matplotlib with
the Agg backend.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from matplotlib.backends.backend_pdf import PdfPages  # noqa: E402


def plot_top_sites(table, sites, pools1, pools2, cfg, max_sites: int = None):
    """One page per top site: signal distributions of both groups across the
    ±window neighborhood plus p-value bar tracks."""
    max_sites = max_sites or cfg.rank.top_n
    os.makedirs(cfg.out_folder, exist_ok=True)
    path = os.path.join(cfg.out_folder, f"rplot_{cfg.file_id}.pdf")
    w = cfg.rank.window
    with PdfPages(path) as pdf:
        for site in sites[:max_sites]:
            key = (site.chrom, site.strand)
            g1 = pools1.get(key)
            g2 = pools2.get(key)
            if g1 is None or g2 is None:
                continue
            positions = range(site.pos - w, site.pos + w + 1)
            data1, data2, labels, pvals = [], [], [], []
            for p in positions:
                i1 = np.searchsorted(g1.positions, p)
                i2 = np.searchsorted(g2.positions, p)
                ok1 = i1 < len(g1.positions) and g1.positions[i1] == p
                ok2 = i2 < len(g2.positions) and g2.positions[i2] == p
                v1 = g1.values[i1, : g1.counts[i1]] if ok1 else np.empty(0)
                v2 = g2.values[i2, : g2.counts[i2]] if ok2 else np.empty(0)
                data1.append(v1[np.isfinite(v1)])
                data2.append(v2[np.isfinite(v2)])
                base = g2.base[i2] if ok2 else "?"
                labels.append(f"{p + 1}/{base}")
                ti = np.searchsorted(table.positions, p)
                hits = np.where(
                    (table.positions == p)
                    & (table.group_ids == table.group_ids[site.table_index])
                )[0]
                _, p_col = table.columns(cfg.stats)
                pvals.append(float(p_col[hits[0]]) if len(hits) else 1.0)

            fig, (ax1, ax2) = plt.subplots(
                2, 1, figsize=(max(8, w * 1.7), 6),
                gridspec_kw={"height_ratios": [3, 1]}, sharex=True)
            xs = np.arange(len(labels))
            for i, (d1, d2) in enumerate(zip(data1, data2)):
                if len(d1):
                    parts = ax1.violinplot([d1], positions=[i - 0.18],
                                           widths=0.32, showextrema=False)
                    for b in parts["bodies"]:
                        b.set_facecolor("#4878CF")
                        b.set_alpha(0.6)
                if len(d2):
                    parts = ax1.violinplot([d2], positions=[i + 0.18],
                                           widths=0.32, showextrema=False)
                    for b in parts["bodies"]:
                        b.set_facecolor("#D65F5F")
                        b.set_alpha(0.6)
            ax1.set_ylabel("normalized signal")
            ax1.set_title(
                f"rank {site.rank}: {site.chrom}:{site.pos + 1} "
                f"({site.strand}) — group1 blue vs group2 red")
            ax2.bar(xs, np.log10(np.maximum(pvals, 1e-300)), color="#6ACC65")
            ax2.set_ylabel("log10 p")
            ax2.set_xticks(xs)
            ax2.set_xticklabels(labels, rotation=90, fontsize=7)
            fig.tight_layout()
            pdf.savefig(fig)
            plt.close(fig)
    return path


def plot_rank_histogram(grouped: Dict, labels: List[str], out_path: str,
                        xlabel: str = "MixedPerc"):
    """Stacked per-bin fraction bars across the sweep values
    (Hist_sim_plot.R equivalent)."""
    keys = sorted(grouped)
    xs = np.arange(len(keys))
    cmap = plt.get_cmap("RdYlGn_r")
    colors = [cmap(i / max(len(labels) - 1, 1)) for i in range(len(labels))]
    fig, ax = plt.subplots(figsize=(max(6, len(keys) * 1.5), 4))
    bottom = np.zeros(len(keys))
    for lab, color in zip(labels, colors):
        vals = np.array([grouped[k].get(lab, 0.0) for k in keys])
        ax.bar(xs, vals, bottom=bottom, label=lab, color=color, width=0.7)
        bottom += vals
    ax.set_xticks(xs)
    ax.set_xticklabels([str(k) for k in keys])
    ax.set_xlabel(xlabel)
    ax.set_ylabel("Fraction")
    ax.legend(fontsize=7, bbox_to_anchor=(1.02, 1), loc="upper left",
              title="Rank percentile")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
