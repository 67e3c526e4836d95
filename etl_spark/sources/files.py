"""File sources with the reference's snapshot discipline.

The reference reads immutable, md5-pinned source files (DVC,
etl/snapshot.py:50-172; md5 verify lib/walden/owid/walden/files.py:75-86)
into metadata-carrying tables with normalized (underscored) column
names (lib/catalog/owid/catalog/utils.py:17-26, tables.py:1070-1146),
and writes JSON sidecar metadata next to the data
(tables.py:243-251 — deliberately NOT embedded, to keep partial reads
cheap). Re-expressed here:

- ``read_csv`` / ``read_json`` / ``read_parquet``: explicit-schema
  readers (never inference in production paths — inference is a full
  extra pass at scale) with snake_case column normalization;
- ``Snapshot``: a pinned file + expected md5; ``read`` verifies the
  pin before handing the DataFrame over — the immutability contract
  that makes replay deterministic;
- ``write_with_meta`` / ``read_meta``: dataset + JSON sidecar.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def underscore(name: str) -> str:
    """snake_case a column name — the reference's mandatory naming
    normalization (utils.py:17-26, enforced at datasets.py:99-101)."""
    s = re.sub(r"[^\w]+", "_", name.strip())
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    s = re.sub(r"_+", "_", s).strip("_").lower()
    return s or "_"


def normalize_columns(df: DataFrame) -> DataFrame:
    cols = [underscore(c) for c in df.columns]
    if len(set(cols)) != len(cols):
        raise ValueError(f"column name collision after normalization: {cols}")
    return df.toDF(*cols)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    r = spark.read.options(header=str(header).lower(), **options)
    df = (r.schema(schema) if schema is not None else r.option("inferSchema", "true")).csv(path)
    return normalize_columns(df)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options
) -> DataFrame:
    r = spark.read.options(**options)
    df = (r.schema(schema) if schema is not None else r).json(path)
    return normalize_columns(df)


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return normalize_columns(r.parquet(path))


def read_feather(spark: SparkSession, path: str) -> DataFrame:
    """Feather/Arrow-IPC reader — the reference's default on-disk
    format (lib/catalog/owid/catalog/tables.py:143-163, datasets.py:24-39).
    Feather files are snapshot-scale (single immutable source files,
    not lake data), so the read is pyarrow on the driver, handed to
    Spark via Arrow createDataFrame; lake-scale data stays parquet."""
    import pyarrow.feather as feather

    table = feather.read_table(path)
    df = spark.createDataFrame(table.to_pandas())
    return normalize_columns(df)


def _xlsx_cell_col(ref: str) -> int:
    """0-based column index from an A1-style cell reference."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _read_xlsx_rows(path: str, sheet=0) -> list[list]:
    """Minimal stdlib xlsx sheet reader (zipfile + ElementTree — an
    xlsx is a zip of XML). Covers the snapshot-reader surface the
    reference uses (etl/snapshot.py:141-172 via pandas.read_excel):
    shared strings (incl. rich-text runs), inline strings, formula
    cached strings, booleans, numbers (int when integral), blank
    cells as None. ``sheet`` selects by 0-based index or by name
    (workbook order, resolved through the workbook rels)."""
    import zipfile
    from xml.etree import ElementTree as ET

    with zipfile.ZipFile(path) as z:
        # sheet name -> worksheet part, in workbook order
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            r.get("Id"): r.get("Target").lstrip("/")
            for r in rels.findall("{*}Relationship")
        }
        sheets = []  # (name, zip path)
        for s in wb.find("{*}sheets").findall("{*}sheet"):
            rid = s.get("{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id")
            target = rid_to_target[rid]
            if not target.startswith("xl/"):
                target = "xl/" + target
            sheets.append((s.get("name"), target))
        if isinstance(sheet, int):
            name, target = sheets[sheet]
        else:
            match = [t for n, t in sheets if n == sheet]
            if not match:
                raise ValueError(f"no such sheet {sheet!r}; have {[n for n, _ in sheets]}")
            target = match[0]

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.findall("{*}si"):
                # plain <t> or rich-text runs <r><t>; concatenate runs
                shared.append("".join(t.text or "" for t in si.iter() if t.tag.endswith("}t")))

        def cell_value(c):
            t = c.get("t", "n")
            if t == "inlineStr":
                is_el = c.find("{*}is")
                return "".join(
                    el.text or "" for el in is_el.iter() if el.tag.endswith("}t")
                ) if is_el is not None else None
            v = c.find("{*}v")
            if v is None or v.text is None:
                return None
            if t == "s":
                return shared[int(v.text)]
            if t in ("str",):  # formula cached string
                return v.text
            if t == "b":
                return v.text == "1"
            x = float(v.text)
            return int(x) if x.is_integer() else x

        ws = ET.fromstring(z.read(target))
        rows: list[list] = []
        for row in ws.find("{*}sheetData").findall("{*}row"):
            out: list = []
            for c in row.findall("{*}c"):
                ref = c.get("r")
                idx = _xlsx_cell_col(ref) if ref else len(out)
                while len(out) < idx:
                    out.append(None)  # gap: blank cells are omitted from the XML
                out.append(cell_value(c))
            rows.append(out)
        return rows


def read_excel(spark: SparkSession, path: str, sheet=0, **options) -> DataFrame:
    """Excel snapshot reader (snapshot.py:148-164, tables.py:1087-1110).
    With openpyxl present the file loads driver-side via
    pandas.read_excel exactly like the reference; without it (this
    sandbox) a stdlib zipfile+ElementTree sheet parser handles the
    shared-strings/inline/number/boolean cell vocabulary — no new
    dependency. Excel files are snapshot-scale (single immutable
    source files), so driver-side parsing is the right cost model;
    lake-scale data stays parquet. First row is the header."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet, **options)
        return normalize_columns(spark.createDataFrame(pdf))
    except ImportError:
        pass
    rows = _read_xlsx_rows(path, sheet=sheet)
    if not rows:
        raise ValueError(f"empty sheet in {path}")
    header = [str(h) for h in rows[0]]
    width = len(header)
    data = [tuple(r[:width]) + (None,) * (width - len(r)) for r in rows[1:]]
    import pandas as pd

    pdf = pd.DataFrame(data, columns=header)
    return normalize_columns(spark.createDataFrame(pdf))


def file_md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


class SnapshotError(RuntimeError):
    pass


class Snapshot:
    """An immutable, checksum-pinned local source file.

    ``read`` refuses to load bytes that do not match the pin — a
    changed upstream file must arrive as a NEW snapshot (new pin),
    which is what makes any replay over it reproducible. This is the
    reference's DVC-md5 contract (etl/snapshot.py:290-295) without
    DVC."""

    def __init__(self, path: str, md5: str, fmt: str = "csv", schema=None, **options):
        self.path = path
        self.md5 = md5
        self.fmt = fmt
        self.schema = schema
        self.options = options

    def verify(self) -> None:
        actual = file_md5(self.path)
        if actual != self.md5:
            raise SnapshotError(
                f"snapshot pin mismatch for {self.path}: expected {self.md5}, got {actual}"
            )

    def read(self, spark: SparkSession) -> DataFrame:
        self.verify()
        if self.fmt == "csv":
            return read_csv(spark, self.path, schema=self.schema, **self.options)
        if self.fmt == "json":
            return read_json(spark, self.path, schema=self.schema, **self.options)
        if self.fmt == "parquet":
            return read_parquet(spark, self.path, schema=self.schema)
        if self.fmt == "feather":
            return read_feather(spark, self.path)
        if self.fmt == "excel":
            return read_excel(spark, self.path, **self.options)
        raise ValueError(f"unsupported snapshot format: {self.fmt}")

    @classmethod
    def pin(cls, path: str, fmt: str = "csv", schema=None, **options) -> "Snapshot":
        """Create the pin for an existing file (the snapshot-publish
        step, etl/snapshot.py:80-121)."""
        return cls(path, file_md5(path), fmt=fmt, schema=schema, **options)

    @classmethod
    def pull(
        cls, url: str, dest: str, md5: str, fmt: str = "csv",
        schema=None, chunk_bytes: int = 1 << 20, **options,
    ) -> "Snapshot":
        """Fetch a pinned snapshot from a URL — the reference's
        Snapshot.pull / download_from_source (etl/snapshot.py:80-121)
        with the DVC-md5 contract inlined:

        - already-pinned local copy -> no transfer (idempotent pull);
        - otherwise stream to a tmp file in ``chunk_bytes`` pieces,
          hashing as bytes arrive (never the whole file in memory);
        - the md5 is verified BEFORE the atomic rename publishes the
          file — a corrupted/changed upstream can never land at
          ``dest``, and a reader holding the old path never sees torn
          bytes.

        urllib handles file:// (exercised in tests — this sandbox has
        no network) and http(s):// (same code path in production).
        """
        import urllib.request

        if os.path.exists(dest) and file_md5(dest) == md5:
            return cls(dest, md5, fmt=fmt, schema=schema, **options)
        os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
        tmp = f"{dest}.tmp.{os.getpid()}"
        h = hashlib.md5()
        try:
            with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
                for chunk in iter(lambda: r.read(chunk_bytes), b""):
                    h.update(chunk)
                    f.write(chunk)
                f.flush()
                os.fsync(f.fileno())
            if h.hexdigest() != md5:
                raise SnapshotError(
                    f"pull pin mismatch for {url}: expected {md5}, got {h.hexdigest()}"
                )
            os.replace(tmp, dest)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        return cls(dest, md5, fmt=fmt, schema=schema, **options)


# ---------------------------------------------------------------------------
# conditional refresh (the reference's ETag/URL change detection,
# etl/steps/__init__.py:867-886: a source step is dirty only when the
# remote's ETag differs from the stored one)
# ---------------------------------------------------------------------------


class ConditionalSource:
    """An upstream-refreshable snapshot with ETag-style change
    detection and an INJECTABLE transport (this sandbox has no
    network; production passes an HTTP conditional-GET closure).

    ``fetch(etag)`` contract: return ``None`` when the upstream
    reports not-modified for ``etag`` (HTTP 304), else
    ``(content_bytes, new_etag)``. Two fences decide dirtiness, in
    order: the transport's etag (cheap, no download), then the content
    md5 (an upstream that rotates etags without changing bytes — the
    reference's checksum fence — does NOT dirty the snapshot; only the
    stored etag advances). State lives in a ``<path>.pin.json``
    sidecar; the file itself is replaced atomically (tmp+rename), so a
    reader holding the old pin never sees torn bytes."""

    def __init__(self, path: str, fetch, fmt: str = "csv", schema=None, **options):
        self.path = path
        self.fetch = fetch
        self.fmt = fmt
        self.schema = schema
        self.options = options

    @property
    def _pin_path(self) -> str:
        return f"{self.path}.pin.json"

    def pin_state(self) -> dict:
        if not os.path.exists(self._pin_path):
            return {}
        with open(self._pin_path) as f:
            return json.load(f)

    def snapshot(self) -> Snapshot:
        st = self.pin_state()
        if not st:
            raise SnapshotError(f"no pinned snapshot yet at {self.path}; call refresh()")
        return Snapshot(self.path, st["md5"], fmt=self.fmt, schema=self.schema, **self.options)

    def refresh(self, force: bool = False) -> dict:
        """Fetch-if-changed. Returns {refreshed, reason, md5, etag}."""
        st = self.pin_state()
        res = self.fetch(None if force else st.get("etag"))
        if res is None:
            return {"refreshed": False, "reason": "etag_match", **st}
        content, etag = res
        new_md5 = hashlib.md5(content).hexdigest()
        if st.get("md5") == new_md5:
            # bytes unchanged under a rotated etag: advance the etag
            # only, keep the pinned file untouched
            self._write_pin({**st, "etag": etag})
            return {"refreshed": False, "reason": "content_match", "md5": new_md5, "etag": etag}
        tmp = f"{self.path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)
        self._write_pin({"md5": new_md5, "etag": etag})
        return {"refreshed": True, "reason": "changed", "md5": new_md5, "etag": etag}

    def _write_pin(self, st: dict) -> None:
        tmp = f"{self._pin_path}.tmp"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, self._pin_path)


# ---------------------------------------------------------------------------
# dataset + sidecar metadata (tables.py:120-256 write path)
# ---------------------------------------------------------------------------


def write_with_meta(
    df: DataFrame, path: str, meta: dict | None = None, mode: str = "overwrite"
) -> None:
    """Write parquet + a ``.meta.json`` sidecar (metadata out-of-band,
    exactly like the reference keeps it out of the parquet schema so
    readers do not pay for it)."""
    df.write.mode(mode).parquet(path)
    sidecar = {
        "columns": [{"name": f.name, "type": f.dataType.simpleString()} for f in df.schema.fields],
        **(meta or {}),
    }
    with open(os.path.join(path, ".meta.json"), "w") as f:
        json.dump(sidecar, f, indent=2, sort_keys=True)


def read_meta(path: str) -> dict:
    with open(os.path.join(path, ".meta.json")) as f:
        return json.load(f)
