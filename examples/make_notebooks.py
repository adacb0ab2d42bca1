"""Generate the notebook gallery from the example scripts.

The reference ships its examples as Jupyter notebooks
(/root/reference/Examples/*.ipynb); this repo keeps the runnable
scripts as the source of truth and derives one notebook per script —
module docstring as a markdown cell, the code split into cells on
top-level statements' blank-line groups.  Pure-stdlib (an .ipynb is
just JSON), re-run after editing an example:

    python examples/make_notebooks.py
"""

import ast
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "notebooks")

SCRIPTS = [
    "strings_knn.py",
    "wasserstein_digits.py",
    "graph_shortest_path.py",
    "query_example.py",
    "instance_selection.py",
    "custom_anchor_picker.py",
    "umap_hdbscan_digits.py",
]


def cells_from_script(path):
    src = open(path).read()
    tree = ast.parse(src)
    lines = src.splitlines()
    cells = []
    doc = ast.get_docstring(tree)
    body = list(tree.body)
    if doc is not None:
        cells.append(("markdown", doc))
        body = body[1:]
    # group consecutive top-level statements separated by blank lines
    groups = []
    cur = []
    prev_end = None
    for node in body:
        start = node.lineno - 1
        if prev_end is not None and any(
            not lines[t].strip() for t in range(prev_end, start)
        ) and cur:
            groups.append(cur)
            cur = []
        cur.append(node)
        prev_end = node.end_lineno
    if cur:
        groups.append(cur)
    for g in groups:
        s = g[0].lineno - 1
        e = g[-1].end_lineno
        code = "\n".join(lines[s:e]).strip()
        # __file__ is undefined in a notebook: swap the script's
        # sys.path shim for a cwd-relative one (notebooks live in
        # examples/notebooks/, the package two levels up)
        if "sys.path.insert" in code and len(code.splitlines()) <= 2:
            cells.append((
                "code",
                "import os, sys\n"
                "sys.path.insert(0, os.path.abspath"
                "(os.path.join(os.getcwd(), '..', '..')))",
            ))
            continue
        if code.startswith("if __name__"):
            code = "main()"
        if code:
            cells.append(("code", code))
    return cells


def to_notebook(cells):
    nb_cells = []
    for kind, text in cells:
        lines = [ln + "\n" for ln in text.splitlines()]
        if lines:
            lines[-1] = lines[-1].rstrip("\n")
        if kind == "markdown":
            nb_cells.append(
                {"cell_type": "markdown", "metadata": {}, "source": lines}
            )
        else:
            nb_cells.append(
                {
                    "cell_type": "code",
                    "metadata": {},
                    "execution_count": None,
                    "outputs": [],
                    "source": lines,
                }
            )
    return {
        "cells": nb_cells,
        "metadata": {
            "kernelspec": {
                "display_name": "Python 3",
                "language": "python",
                "name": "python3",
            },
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def main():
    os.makedirs(OUT, exist_ok=True)
    for name in SCRIPTS:
        path = os.path.join(HERE, name)
        nb = to_notebook(cells_from_script(path))
        out = os.path.join(OUT, name.replace(".py", ".ipynb"))
        with open(out, "w") as fh:
            json.dump(nb, fh, indent=1)
        print("wrote", out)


if __name__ == "__main__":
    main()
