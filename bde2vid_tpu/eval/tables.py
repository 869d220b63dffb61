"""Result-table generation (reference scripts/generate_table.py:23-54).

Same input schema — result JSON files of
``{dataset: {sequence: {metric: value}}}`` — and the same table layout
(per-dataset table, rows = sequences + Mean, columns = ``measure/method``),
rendered with an in-house ASCII grid (prettytable isn't available here).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence


def _render_table(title: str, columns: Dict[str, List[str]]) -> str:
    names = list(columns)
    rows = max(len(v) for v in columns.values())
    cells = [[str(columns[n][r]) if r < len(columns[n]) else "" for n in names] for r in range(rows)]
    widths = [max(len(n), *(len(row[i]) for row in cells)) for i, n in enumerate(names)]
    total = sum(w + 3 for w in widths) + 1

    def hline():
        return "+" + "+".join("-" * (w + 2) for w in widths) + "+"

    out = []
    out.append(hline())
    pad = max(total - 2, len(title))
    out.append("|" + title.center(pad) + "|")
    out.append(hline())
    for row in cells:
        out.append(
            "| " + " | ".join(v.center(w) for v, w in zip(row, widths)) + " |"
        )
        out.append(hline())
    return "\n".join(out)


def load_json(path: str):
    name = os.path.split(path)[-1].split(".")[0]
    with open(path) as fp:
        return name, json.load(fp)


def generate_table(
    res_files: Sequence[str], outfile: str, loss: Optional[Sequence[str]] = None
) -> str:
    """Render per-dataset tables with a Mean row appended, like the reference."""
    results = dict(load_json(f) for f in res_files)
    methods = list(results)
    datasets = list(results[methods[0]])

    chunks = []
    for dataset in datasets:
        sequences = list(results[methods[0]][dataset])
        columns: Dict[str, List[str]] = {"Sequence": sequences + ["Mean"]}
        measures = list(results[methods[0]][dataset][sequences[0]])
        if loss is not None:
            measures = [m for m in measures if m in loss]
        for measure in measures:
            for method in methods:
                vals = [
                    round(results[method][dataset][s][measure], 8) for s in sequences
                ]
                vals.append(sum(vals) / len(vals))
                columns[f"{measure}/{method}"] = [f"{v}" for v in vals]
        chunks.append(_render_table(f"Results on {dataset}", columns))
    text = "\n".join(chunks) + "\n"
    with open(outfile, "w") as fp:
        fp.write(text)
    return text
