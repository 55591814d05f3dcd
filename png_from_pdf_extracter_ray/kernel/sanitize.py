"""Filename sanitizer — behavior-equal to the reference's string kernel.

Contract (from /root/reference/src/utils/file_utils.py:6-47 and its golden
unit cases /root/reference/tests/unit/test_pdf_converter.py:19-43):

1. drop the last ``.ext`` if the name contains a dot;
2. replace every char outside ``[A-Za-z0-9_-]`` with ``_``;
3. collapse runs of ``_`` to one;
4. strip leading/trailing ``_``;
5. truncate to ``max_length`` (default 50);
6. empty result → ``"unnamed"``.

Implementation is our own; only the externally observable contract matches.
"""

from __future__ import annotations

import re

_BAD = re.compile(r"[^A-Za-z0-9_-]+")
_RUNS = re.compile(r"__+")


def sanitize_filename(filename: str, max_length: int = 50) -> str:
    stem, dot, _ext = filename.rpartition(".")
    name = stem if dot else filename
    name = _RUNS.sub("_", _BAD.sub("_", name)).strip("_")
    name = name[:max_length]
    return name or "unnamed"
