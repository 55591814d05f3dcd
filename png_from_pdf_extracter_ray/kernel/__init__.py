"""Pure single-row extraction kernel — shared by the single-process oracle
and the distributed Ray Data UDF (byte-identity by construction)."""
