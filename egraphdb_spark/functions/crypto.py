"""F16 — password hashing (reference: src/egraph_util.erl:273-310).

The reference exposes two deterministic password-hash functions:

* ``hash_password(Password, Salt)`` — PBKDF2-HMAC-SHA256 with **128**
  iterations and a **32**-byte derived key (egraph_util.erl:286-292).
* ``hash_password_hmac(Key, Password, Salt)`` — HMAC-SHA1 over
  ``Password || Salt`` keyed by ``Key`` (egraph_util.erl:294-305).

``create_salt`` (egraph_util.erl:265-280) is a random-bytes generator and
therefore outside the deterministic analytic surface; callers supply the
salt column.

Neither PBKDF2 nor HMAC exists as a Spark SQL built-in, and expressing the
128-iteration XOR chain as a column-expression tree would mean ~256 nested
``sha2(unhex(...))`` calls plus per-byte XORs — pathological for codegen.
This is the legitimate pandas-UDF case: ``hashlib.pbkdf2_hmac`` and
``hmac.digest`` are C implementations, Arrow batches amortize transfer, and
password hashing is inherently per-row CPU work with no algebraic rewrite.
The UDFs are marked deterministic so Catalyst may still prune/reorder around
them.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType

# Reference constants (egraph_util.erl:288-289).
PBKDF2_ITERATIONS = 128
PBKDF2_DKLEN = 32


@F.pandas_udf(StringType())
def _pbkdf2_sha256(password: pd.Series, salt: pd.Series) -> pd.Series:
    out = [
        None
        if p is None or s is None
        else hashlib.pbkdf2_hmac(
            "sha256",
            p.encode("utf-8"),
            s.encode("utf-8"),
            PBKDF2_ITERATIONS,
            PBKDF2_DKLEN,
        ).hex()
        for p, s in zip(password, salt)
    ]
    return pd.Series(out)


@F.pandas_udf(StringType())
def _hmac_sha1(key: pd.Series, password: pd.Series, salt: pd.Series) -> pd.Series:
    out = [
        None
        if k is None or p is None or s is None
        else _hmac.digest(
            k.encode("utf-8"), p.encode("utf-8") + s.encode("utf-8"), "sha1"
        ).hex()
        for k, p, s in zip(key, password, salt)
    ]
    return pd.Series(out)


def hash_password(password, salt) -> Column:
    """PBKDF2-HMAC-SHA256(128 iter, 32 B) as a lowercase-hex string column."""
    p = F.col(password) if isinstance(password, str) else password
    s = F.col(salt) if isinstance(salt, str) else salt
    return _pbkdf2_sha256(p, s)


def hash_password_hmac(key, password, salt) -> Column:
    """HMAC-SHA1(key, password || salt) as a lowercase-hex string column."""
    k = F.col(key) if isinstance(key, str) else key
    p = F.col(password) if isinstance(password, str) else password
    s = F.col(salt) if isinstance(salt, str) else salt
    return _hmac_sha1(k, p, s)


def reference_vectors(custkeys) -> list[tuple[int, str, str]]:
    """Known-answer vectors for the gate oracle: for each key k, the expected
    digests of (pw_k, salt_k) under both reference functions, computed by the
    independent CPython implementations."""
    rows = []
    for k in custkeys:
        pw = f"pw_{k}".encode()
        salt = f"salt_{k}".encode()
        pbk = hashlib.pbkdf2_hmac(
            "sha256", pw, salt, PBKDF2_ITERATIONS, PBKDF2_DKLEN
        ).hex()
        mac = _hmac.digest(b"engine_key", pw + salt, "sha1").hex()
        rows.append((k, pbk, mac))
    return rows
