#!/usr/bin/env python
"""Generate walkthrough.ipynb from walkthrough.py (percent format)."""

import json
import re
from pathlib import Path


def py_to_ipynb(src: str) -> dict:
    cells = []
    chunks = re.split(r"^# %%", src, flags=re.M)
    for chunk in chunks:
        if not chunk.strip():
            continue
        if chunk.startswith(" [markdown]"):
            lines = chunk.splitlines()[1:]
            md = [re.sub(r"^# ?", "", ln) for ln in lines]
            while md and not md[0].strip():
                md.pop(0)
            while md and not md[-1].strip():
                md.pop()
            cells.append({"cell_type": "markdown", "metadata": {},
                          "source": [ln + "\n" for ln in md]})
        else:
            code = chunk.splitlines()
            while code and not code[0].strip():
                code.pop(0)
            while code and not code[-1].strip():
                code.pop()
            if code:
                cells.append({"cell_type": "code", "metadata": {},
                              "execution_count": None, "outputs": [],
                              "source": [ln + "\n" for ln in code]})
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


if __name__ == "__main__":
    here = Path(__file__).parent
    nb = py_to_ipynb((here / "walkthrough.py").read_text())
    (here / "walkthrough.ipynb").write_text(json.dumps(nb, indent=1))
    print(f"wrote {here / 'walkthrough.ipynb'} ({len(nb['cells'])} cells)")
