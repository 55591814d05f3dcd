"""Ray-Data-native main-content extraction engine.

A brand-new, partition-parallel document-extraction pipeline with the
capabilities of the reference repo Soneritics/png-from-pdf-extracter
(/root/reference — a sequential IMAP→PDF→PNG→SMTP daemon), re-expressed
over a Common-Crawl-style Parquet pages table:

    (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)

Pipeline shape (all Ray Data):
    read_parquet → lang whitelist filter → content-type sniff →
    HTML branch (DOM parse + boilerplate strip) / PDF branch
    (actor-pool page parse + text-span extraction + PNG raster) →
    groupby-url dedup → partitioned parquet + lineage manifests.

The per-row kernel (`kernel.extract.extract_one`) is shared between the
single-process oracle and the distributed UDF, making extracted text
byte-identical per url by construction (verified by tests, not assumed).
"""

# Bump on ANY kernel/pipeline behavior change: /tmp result caches (the
# extracted-pages cache and the single-process oracle parquets) are
# keyed by this + CORPUS_VERSION, so a stale version here would serve
# pre-change extractions.
__version__ = "0.4.0"
