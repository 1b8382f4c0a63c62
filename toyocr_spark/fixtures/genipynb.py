"""Deterministic Jupyter-notebook fixture builder — nbformat-v4-shaped
JSON documents with the structural boilerplate a crawl-scale extractor
must drop: kernelspec/language_info metadata (never read), a
link-dominated markdown nav cell (dies by the shared link-density
rule), an image/png display output (binary payload, walk-don't-decode),
an error-output traceback, and a raw cell (nbconvert passthrough).
Pure json.dumps assembly with list-of-lines sources (the serialization
jupyter actually writes), so extractor/ipynb.py is tested against an
independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations

import json


def nav_cell(host: str) -> dict:
    """A link-dominated markdown cell: three md links joined by
    separators — link chars dominate, the scorer must drop it."""
    src = (
        f"[Home](https://{host}/) | [About](https://{host}/about)"
        f" | [Contact](https://{host}/contact)"
    )
    return {"cell_type": "markdown", "metadata": {}, "source": [src]}


def _lines(text: str) -> list[str]:
    """nbformat stores source as a list of '\\n'-terminated lines."""
    ls = text.split("\n")
    return [ln + "\n" for ln in ls[:-1]] + [ls[-1]]


def build_ipynb(
    title: str,
    paras: list[str],
    *,
    host: str = "nav.example",
    code: str | None = None,
    output: str | None = None,
    kernel: str = "python3",
    links: list[tuple[str, str]] | None = None,
    with_image_output: bool = True,
    with_error_output: bool = True,
    with_raw_cell: bool = True,
) -> bytes:
    """Assemble a notebook: a nav plant, a markdown cell (# title +
    paragraphs), then an optional code cell whose outputs carry a
    stream `output` plus the chrome plants (image/png display data,
    an error traceback). `links` embeds [text](url) pairs at the end
    of the LAST paragraph (outlink-mining fixtures)."""
    body = list(paras)
    if links and body:
        tail = " ".join(f"[{t}]({u})" for t, u in links)
        body[-1] = f"{body[-1]} {tail}"
    md = f"# {title}\n\n" + "\n\n".join(body)
    cells: list[dict] = [
        # nav BEFORE the title: the link-dominated cell is a hard
        # island boundary (not absorbable), so it must not sever the
        # title from the body it belongs to (the genmd ordering)
        nav_cell(host),
        {"cell_type": "markdown", "metadata": {}, "source": _lines(md)},
    ]
    if code is not None:
        outputs: list[dict] = []
        if output is not None:
            outputs.append(
                {
                    "output_type": "stream",
                    "name": "stdout",
                    "text": _lines(output),
                }
            )
        if with_image_output:
            outputs.append(
                {
                    "output_type": "display_data",
                    "metadata": {},
                    # a real extractor must never lossy-decode this
                    "data": {"image/png": "iVBORw0KGgoAAAANSUhEUg=="},
                }
            )
        if with_error_output:
            outputs.append(
                {
                    "output_type": "error",
                    "ename": "PlantedError",
                    "evalue": "planted traceback chrome",
                    "traceback": ["Traceback (most recent call last):"],
                }
            )
        cells.append(
            {
                "cell_type": "code",
                "execution_count": 1,
                "metadata": {},
                "source": _lines(code),
                "outputs": outputs,
            }
        )
    if with_raw_cell:
        cells.append(
            {
                "cell_type": "raw",
                "metadata": {"format": "text/restructuredtext"},
                "source": ["planted raw-cell passthrough chrome"],
            }
        )
    nb = {
        "cells": cells,
        "metadata": {
            "kernelspec": {
                "display_name": "Planted Kernel Chrome",
                "language": "python",
                "name": kernel,
            },
            "language_info": {"name": "python", "version": "3.11.0"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    return json.dumps(nb, indent=1).encode("utf-8")
