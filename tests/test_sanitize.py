"""Sanitizer golden cases — verbatim from the reference's unit suite
(/root/reference/tests/unit/test_pdf_converter.py:19-43, via FIXTURES.md §2)."""

import pytest

from png_from_pdf_extracter_ray.kernel.sanitize import sanitize_filename

GOLDEN = [
    ("invoice (copy).pdf", "invoice_copy"),
    ("my*file?name.pdf", "my_file_name"),
    ("report#2024!.pdf", "report_2024"),
    ("file:with:colons.pdf", "file_with_colons"),
    ("test@file$here%.pdf", "test_file_here"),
    ("a" * 100 + ".pdf", "a" * 50),
    ("readme", "readme"),
    ("!!!.pdf", "unnamed"),
]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_golden(raw: str, expected: str) -> None:
    assert sanitize_filename(raw) == expected


def test_hyphen_preserved_and_custom_length() -> None:
    assert sanitize_filename("my-file_v2.pdf") == "my-file_v2"
    assert sanitize_filename("abcdef.pdf", max_length=3) == "abc"
