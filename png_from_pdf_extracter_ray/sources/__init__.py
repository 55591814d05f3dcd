"""Dataset sources: pages-table readers and synthesizers."""
