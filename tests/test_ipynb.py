"""Jupyter notebook extraction: the cells/nbformat structural gate and
its traps, markdown-cell re-entry (shared tokenizer), code-cell and
output blocks, the chrome battery (kernelspec metadata, image/png
outputs, error tracebacks, raw cells, the nav cell), v3 worksheets,
cell caps, link mining, fuzz determinism, dispatch precedence — the
same contract battery every format carries (reference analogue: the
byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import json
import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.ipynb import (
    MAX_CELLS,
    ipynb_links,
    is_ipynb,
    tokenize_ipynb,
)
from toyocr_spark.extractor.markdown import is_markdown
from toyocr_spark.fixtures.genipynb import build_ipynb

_PARAS = [
    "first paragraph long enough to be kept by the shared scorer",
    "second paragraph also long enough to be kept by the scorer",
]


def _doc(**kw) -> bytes:
    kw.setdefault("code", "ans = 6 * 7\nprint(ans)")
    kw.setdefault("output", "planted stream output line kept")
    return build_ipynb("Notebook Title Here", _PARAS, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_notebook():
    assert is_ipynb(_doc())


def test_gate_rejects_generic_json_prose_and_markup():
    assert not is_ipynb(json.dumps({"config": True, "rows": [1, 2]}).encode())
    # "cells" key alone is not enough without nbformat
    assert not is_ipynb(json.dumps({"cells": [1, 2, 3]}).encode())
    assert not is_ipynb(b"plain prose about cells and nbformat keys")
    assert not is_ipynb(b"<html><body>x</body></html>")
    assert not is_ipynb(None)
    assert not is_ipynb(b"\x00" + _doc())


def test_gate_outranks_markdown():
    """A notebook whose markdown cells are heading/list/link-rich must
    stay on the ipynb leg: the markdown gate never sees it (dispatch
    order), and the md evidence regexes cannot fire on escaped JSON
    newlines anyway."""
    nb = build_ipynb(
        "Readme Like Title",
        ["- item one long enough\n- item two long enough", *_PARAS],
        links=[("ref", "https://x.example/")],
    )
    assert is_ipynb(nb)
    assert not is_markdown(nb)
    r = extract(nb)
    assert "Readme Like Title" in r.text


# --- structure ---------------------------------------------------------------


def test_title_paragraphs_code_and_output_extract_in_order():
    r = extract(_doc())
    lines = r.text.split("\n")
    assert lines[0] == "Notebook Title Here"
    assert lines[1:3] == _PARAS
    assert lines[3] == "ans = 6 * 7 print(ans)"
    assert lines[4] == "planted stream output line kept"
    assert r.n_kept == 5
    # the markdown title re-entered the shared tokenizer as a heading
    assert r.spans[0][2] == "title"


def test_chrome_never_extracts():
    r = extract(_doc())
    assert "Planted Kernel Chrome" not in r.text  # kernelspec metadata
    assert "iVBORw0KGgo" not in r.text  # image/png payload
    assert "PlantedError" not in r.text  # error traceback
    assert "planted traceback" not in r.text
    assert "raw-cell passthrough" not in r.text  # raw cell
    assert "Home" not in r.text  # nav cell dies by link density


def test_execute_result_text_plain_extracts():
    nb = json.loads(_doc().decode())
    nb["cells"][2]["outputs"] = [
        {
            "output_type": "execute_result",
            "execution_count": 1,
            "metadata": {},
            "data": {
                "text/plain": ["result repr long enough to keep"],
                "image/png": "iVBORw0KGgoAAAANSUhEUg==",
            },
        }
    ]
    r = extract(json.dumps(nb).encode())
    assert "result repr long enough to keep" in r.text
    assert "iVBORw0KGgo" not in r.text


def test_source_as_single_string_and_v3_worksheets():
    # nbformat allows source as one string; v3 nests cells under
    # worksheets and stores code under `input`
    v3 = {
        "worksheets": [
            {
                "cells": [
                    {
                        "cell_type": "markdown",
                        "source": "# Legacy Notebook Title\n\nlegacy paragraph long enough to keep",
                    },
                    {
                        "cell_type": "code",
                        "input": "print('legacy code cell kept')",
                        "outputs": [
                            {
                                "output_type": "pyout",
                                "text": ["legacy pyout text long enough"],
                            }
                        ],
                    },
                ]
            }
        ],
        "metadata": {},
        "nbformat": 3,
        "nbformat_minor": 0,
    }
    r = extract(json.dumps(v3).encode())
    assert r.text.split("\n") == [
        "Legacy Notebook Title",
        "legacy paragraph long enough to keep",
        "print('legacy code cell kept')",
        "legacy pyout text long enough",
    ]


def test_malformed_json_tokenizes_empty():
    assert tokenize_ipynb(_doc()[:-40]) == []  # truncated JSON
    assert tokenize_ipynb(b'{"cells": "not a list", "nbformat": 4}') == []


def test_cell_cap_bounds_the_walk():
    cells = [
        {"cell_type": "markdown", "source": [f"cell {i} text long enough here"]}
        for i in range(MAX_CELLS + 50)
    ]
    nb = json.dumps({"cells": cells, "nbformat": 4}).encode()
    assert len(tokenize_ipynb(nb)) == MAX_CELLS


# --- link mining ---------------------------------------------------------------


def test_links_come_from_markdown_cells_only():
    nb = build_ipynb(
        "T",
        ["para with a [ref](https://x.example/r) link long enough"],
        code='requests.get("https://code.example/never")',
        output="see https://out.example/never",
    )
    links = ipynb_links(nb)
    assert "https://x.example/r" in links
    assert all("code.example" not in u and "out.example" not in u for u in links)
    assert ipynb_links(nb[:-30]) == []  # malformed -> []


# --- fuzz / determinism -------------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc()
    rng = random.Random(7)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)
