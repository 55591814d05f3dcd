"""Immutable pipeline configuration.

Mirrors the reference's env-driven frozen ``Configuration``
(/root/reference/src/config.py:8-166): geometry defaults 1920x1080 @300
DPI on a white background (:36-43), a per-document conversion timeout
(:40, default 120 s), and constructor-time validation (:54-112).

Two additions over the reference:
- ``page_budget`` — a *deterministic* per-document work cap (max pages
  parsed/rendered).  The reference's wall-clock subprocess timeout
  (/root/reference/src/services/pdf_converter.py:96) is inherently
  nondeterministic across runs; byte-identical output per url requires the
  primary cap to be a function of the input only.  The wall-clock
  ``timeout_s`` is kept as a generous safety net.
- ``lang_allow`` — regex whitelist over the ``lang`` column, the analog of
  the sender whitelist regex
  (/root/reference/src/services/whitelist_service.py:26-38).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractConfig:
    # PDF page raster geometry (reference defaults, /root/reference/src/config.py:36-39)
    page_width: int = 1920
    page_height: int = 1080
    dpi: int = 300
    background: int = 255  # grayscale white, ≈ pdf_background="white"

    # Work caps
    timeout_s: float = 120.0          # wall-clock safety net (config.py:40)
    page_budget: int = 500            # deterministic page cap per document
    max_payload_bytes: int = 100 * 1024 * 1024  # pdf_attachment.py:30-31

    # HTML boilerplate-strip heuristics
    min_block_chars: int = 10
    heading_min_chars: int = 2
    max_link_density: float = 0.4

    # Whether the PDF branch renders page PNGs (the heavy raster step).
    render_pages: bool = True

    # Optional whitelist regex applied to the `lang` column (None = keep all).
    lang_allow: str | None = None

    def __post_init__(self) -> None:
        # Constructor-time validation, same spirit as config.py:54-112.
        if self.page_width < 1 or self.page_height < 1:
            raise ValueError("page geometry must be >= 1x1")
        if self.dpi < 1:
            raise ValueError("dpi must be >= 1")
        if not (0 <= self.background <= 255):
            raise ValueError("background must be a grayscale value 0-255")
        if self.timeout_s <= 0:
            raise ValueError("timeout_s must be positive")
        if self.page_budget < 1:
            raise ValueError("page_budget must be >= 1")
        if self.max_payload_bytes < 1:
            raise ValueError("max_payload_bytes must be >= 1")
        if not (0.0 <= self.max_link_density <= 1.0):
            raise ValueError("max_link_density must be in [0, 1]")
        if self.lang_allow is not None:
            re.compile(self.lang_allow)  # raises on invalid pattern

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "ExtractConfig":
        """Build a config from EXTRACT_* environment variables.

        The analog of ``Configuration.from_env``
        (/root/reference/src/config.py:119-166): env parsing with the
        same validation the constructor enforces — invalid values raise
        rather than silently defaulting.
        """
        import os

        e = env if env is not None else dict(os.environ)

        def geti(name: str, default: int) -> int:
            raw = e.get(name)
            if raw is None:
                return default
            try:
                return int(raw)
            except ValueError as exc:
                raise ValueError(f"{name} must be an integer, got {raw!r}") from exc

        def getf(name: str, default: float) -> float:
            raw = e.get(name)
            if raw is None:
                return default
            try:
                return float(raw)
            except ValueError as exc:
                raise ValueError(f"{name} must be a number, got {raw!r}") from exc

        d = cls()
        return cls(
            page_width=geti("EXTRACT_PAGE_WIDTH", d.page_width),
            page_height=geti("EXTRACT_PAGE_HEIGHT", d.page_height),
            dpi=geti("EXTRACT_DPI", d.dpi),
            background=geti("EXTRACT_BACKGROUND", d.background),
            timeout_s=getf("EXTRACT_TIMEOUT_S", d.timeout_s),
            page_budget=geti("EXTRACT_PAGE_BUDGET", d.page_budget),
            max_payload_bytes=geti("EXTRACT_MAX_PAYLOAD_BYTES", d.max_payload_bytes),
            min_block_chars=geti("EXTRACT_MIN_BLOCK_CHARS", d.min_block_chars),
            heading_min_chars=geti("EXTRACT_HEADING_MIN_CHARS", d.heading_min_chars),
            max_link_density=getf("EXTRACT_MAX_LINK_DENSITY", d.max_link_density),
            render_pages=e.get("EXTRACT_RENDER_PAGES", "1") not in ("0", "false", "no"),
            lang_allow=e.get("EXTRACT_LANG_ALLOW") or None,
        )


DEFAULT_CONFIG = ExtractConfig()
