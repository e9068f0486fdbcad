"""Input sources: DSV scan and the genotyping-export variant reader.

Reproduces the reference's ingestion surface
(/root/reference/src/groovy/haplorec/util/Input.groovy:46-140 and
util/pipeline/PipelineInput.groovy:16-123) as Spark readers:

* :func:`dsv_source` — S1: tab-separated scan with optional
  header-detect/require/skip and field projection by name.
* :func:`variant_source` — S2: the 9-column genotyping export
  normalized to job_patient_variant rows: zygosity from allele-string
  length, hom rows duplicated onto physical chromosomes A and B, het
  rows left with a null chromosome (assigned later by het
  disambiguation), empty allele strings becoming all-null no-call rows.
* ``INPUT_HEADERS`` — the seedable stage headers
  (PipelineInput.groovy:15-24); every other stage seeds through
  :func:`dsv_source` with its declared header (the reference's
  defaultReader).

Beyond the reference's surface, :func:`jsonl_source` /
:func:`jsonl_sink` read and write newline-delimited JSON — the
interchange format of LLM training corpora — with an explicit schema
(inference would double-scan 100 TB) and a typed corrupt-record
policy.

Scale: all readers are pure scan + narrow ops (``explode`` fan-out is
map-side); no shuffle is introduced before the pipeline's first stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: PipelineInput.groovy:15-24 — expected first-line headers per stage.
INPUT_HEADERS: dict[str, list[str]] = {
    "variant": ["PLATE", "EXPERIMENT", "CHIP", "WELL_POSITION", "ASSAY_ID",
                "GENOTYPE_ID", "DESCRIPTION", "SAMPLE_ID", "ENTRY_OPERATOR"],
    "genePhenotype": ["SAMPLE_ID", "GENE", "PHENOTYPE"],
    "genotype": ["SAMPLE_ID", "GENE", "HAPLOTYPE1", "HAPLOTYPE2"],
    "geneHaplotype": ["SAMPLE_ID", "GENE", "HAPLOTYPE"],
}


def _list_files(spark: SparkSession, path: str):
    """Resolve ``path`` (file, directory, or glob) to leaf file paths via
    the Hadoop FileSystem API — works on any Spark-supported FS."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(hpath)
    if statuses is None:
        raise FileNotFoundError(path)
    files = []
    for st in statuses:
        if st.isDirectory():
            files.extend(
                s.getPath() for s in fs.listStatus(st.getPath()) if s.isFile()
            )
        else:
            files.append(st.getPath())
    return fs, files


def _first_line(spark: SparkSession, fs, hadoop_path) -> str | None:
    """Read one line from the head of a file (a single small ranged
    read; O(#files) driver work, the same order of metadata I/O the CSV
    reader itself performs)."""
    jvm = spark._jvm
    stream = fs.open(hadoop_path)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        return reader.readLine()
    finally:
        stream.close()


def dsv_source(
    spark: SparkSession,
    path: str,
    header: Sequence[str],
    *,
    separator: str = "\t",
    require_header: bool = False,
    fields: Sequence[str] | None = None,
) -> DataFrame:
    """S1: DSV scan with header-detect and field projection.

    The reference treats a first line equal to the expected header as a
    header and otherwise as data (``requireHeader = false``,
    PipelineInput.groovy:11-13, Input.groovy:95-118). This is exact
    *first-line-of-each-file* semantics: each input file's head is
    peeked driver-side (one tiny ranged read per file), files are split
    into header-led and headerless groups, and each group is scanned
    with the matching ``header`` option — a data row that happens to
    echo the header is NEVER silently dropped. With ``require_header``
    the scan fails on any file whose first line is not the header
    (Input.groovy requireHeader).

    Short rows error out (Input.groovy:82-87): mode=FAILFAST on a fixed
    all-string schema. Plain-text DSV only (no compression codecs — the
    reference reads raw TSV exports).
    """
    schema = ", ".join(f"`{name}` STRING" for name in header)
    expected = separator.join(header)

    fs, files = _list_files(spark, path)
    with_hdr, without_hdr = [], []
    for fp in files:
        (with_hdr if _first_line(spark, fs, fp) == expected
         else without_hdr).append(fp.toString())
    if require_header and without_hdr:
        raise ValueError(
            f"required header {list(header)} not found at the head of "
            f"{without_hdr[:3]}{'...' if len(without_hdr) > 3 else ''}"
        )

    def scan(paths: list[str], has_header: bool) -> DataFrame:
        return (
            spark.read.option("sep", separator)
            .option("header", has_header)
            # the schema is authoritative; header line only skipped
            .option("enforceSchema", True)
            .option("mode", "FAILFAST")
            .schema(schema)
            .csv(paths)
        )

    parts = []
    if with_hdr:
        parts.append(scan(with_hdr, True))
    if without_hdr:
        parts.append(scan(without_hdr, False))
    if not parts:
        out = spark.createDataFrame([], schema)
    else:
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
    if fields:
        out = out.select(*fields)
    return out


def variant_source(
    spark: SparkSession,
    path: str,
    *,
    separator: str = "\t",
    skip_empty_alleles: bool = False,
) -> DataFrame:
    """S2: genotyping export -> (patient_id, physical_chromosome, snp_id,
    allele, zygosity) rows (PipelineInput.variants,
    PipelineInput.groovy:71-123).

    Per input line with allele string ``s``:

    * ``len(s) == 2`` — heterozygous: one row per character, physical
      chromosome null (disambiguated downstream).
    * ``len(s) == 1`` — homozygous: the allele duplicated onto
      chromosomes A and B.
    * ``len(s) == 0`` — no-call: a single row with null chromosome,
      allele, and zygosity (or dropped with ``skip_empty_alleles``).
    * ``len(s) > 2``  — multi-char call (e.g. CAT): homozygous, the full
      string duplicated onto chromosomes A and B.
    """
    raw = dsv_source(
        spark, path, INPUT_HEADERS["variant"], separator=separator,
        fields=["ASSAY_ID", "GENOTYPE_ID", "SAMPLE_ID"],
    ).select(
        F.col("SAMPLE_ID").alias("patient_id"),
        F.col("ASSAY_ID").alias("snp_id"),
        F.coalesce(F.col("GENOTYPE_ID"), F.lit("")).alias("alleles"),
    )
    n = F.length("alleles")
    entry = "named_struct('physical_chromosome', {0}, 'allele', {1}, 'zygosity', {2})"
    rows = F.when(
        n == 2,
        F.expr(
            "array("
            + entry.format("cast(null as string)", "substring(alleles, 1, 1)", "'het'")
            + ", "
            + entry.format("cast(null as string)", "substring(alleles, 2, 1)", "'het'")
            + ")"
        ),
    ).when(
        n == 0,
        F.expr(
            "array("
            + entry.format("cast(null as string)", "cast(null as string)",
                           "cast(null as string)")
            + ")"
        ),
    ).otherwise(
        # hom: 1 char or multi-char string, duplicated onto A and B
        F.expr(
            "array("
            + entry.format("'A'", "alleles", "'hom'")
            + ", "
            + entry.format("'B'", "alleles", "'hom'")
            + ")"
        ),
    )
    out = raw.select(
        "patient_id", "snp_id", F.explode(rows).alias("v")
    ).select(
        "patient_id",
        F.col("v.physical_chromosome").alias("physical_chromosome"),
        "snp_id",
        F.col("v.allele").alias("allele"),
        F.col("v.zygosity").alias("zygosity"),
    )
    if skip_empty_alleles:
        out = out.filter(F.col("allele").isNotNull())
    return out


def jsonl_source(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    mode: str = "PERMISSIVE",
    corrupt_column: str = "_corrupt_record",
) -> DataFrame:
    """Newline-delimited JSON scan with an explicit schema.

    The schema is REQUIRED: Spark's JSON schema inference runs a whole
    extra pass over the data, which at corpus scale doubles the scan
    cost and pins the job to whatever the sample happened to contain.

    ``mode``:

    * ``PERMISSIVE`` (default) — malformed lines land in
      ``corrupt_column`` (added to the schema here) with every data
      field null; downstream splits clean from quarantined rows with
      one filter. The right default for web-scale corpora where a
      dropped shard is worse than a quarantine table. Spark caveat:
      a query whose referenced columns are ONLY the corrupt column
      (e.g. ``filter(corrupt.isNotNull()).count()``) is rejected
      (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — select at least one data
      column alongside it, or cache the parsed frame first.
    * ``DROPMALFORMED`` — silently discard bad lines (no corrupt
      column added; counts are the caller's job).
    * ``FAILFAST`` — die on the first bad line (ingest of data that is
      supposed to be machine-written).
    """
    reader = spark.read.schema(
        schema
        + (f", {corrupt_column} STRING" if mode == "PERMISSIVE" else "")
    ).option("mode", mode)
    if mode == "PERMISSIVE":
        reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
    return reader.json(path)


def jsonl_sink(
    df: DataFrame,
    path: str,
    *,
    compression: str = "gzip",
    max_records_per_file: int = 0,
    overwrite: bool = True,
) -> None:
    """Write newline-delimited JSON shards.

    ``max_records_per_file`` bounds shard size (0 = one file per
    partition) — at export scale this is the knob that keeps a
    downstream loader's unit of work bounded without a repartition
    shuffle; compression defaults to gzip, the JSONL ecosystem's
    common denominator.
    """
    w = df.write.mode("overwrite" if overwrite else "error").option(
        "compression", compression
    )
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.json(path)


#: Output schema of :func:`warc_source` — one row per WARC record.
WARC_SCHEMA = (
    "source_file STRING, record_ix INT, record_offset BIGINT, "
    "record_id STRING, record_type STRING, target_uri STRING, "
    "warc_date STRING, content_type STRING, content_length BIGINT, "
    "text STRING, _corrupt_record STRING"
)

_WARC_BATCH_ROWS = 1024  # bound per-yield Arrow batch size


def _parse_warc_member(data: bytes, source: str, start_ix: int):
    """Parse one uncompressed WARC stream, YIELDING record dicts one
    at a time (pure Python, executor-side; shared by the .warc and
    .warc.gz paths). A generator, not a list (review-caught, round
    9): materializing every decoded record next to the uncompressed
    stream doubled peak per-task memory; streaming them out bounds
    the overhead to one record + one Arrow batch.

    Record framing follows ISO 28500: a version line, CRLF-separated
    named headers up to a blank line, exactly ``Content-Length`` bytes
    of payload, then two CRLFs. Malformed framing quarantines the REST
    of the stream as one row (after a framing error, record boundaries
    are unrecoverable — resyncing on the next 'WARC/' literal could
    split a payload that legitimately contains it)."""
    pos = 0
    ix = start_ix
    n = len(data)
    while pos < n:
        # tolerate stray CRLFs between records (some writers pad)
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        rec = {
            "source_file": source, "record_ix": ix, "record_offset": pos,
            "record_id": None, "record_type": None, "target_uri": None,
            "warc_date": None, "content_type": None,
            "content_length": None, "text": None, "_corrupt_record": None,
        }
        hdr_end = data.find(b"\r\n\r\n", pos)
        if not data.startswith(b"WARC/", pos) or hdr_end < 0:
            rec["_corrupt_record"] = (
                f"unparseable record framing at offset {pos}"
            )
            yield rec
            return
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        rec["record_id"] = headers.get("warc-record-id")
        rec["record_type"] = headers.get("warc-type")
        rec["target_uri"] = headers.get("warc-target-uri")
        rec["warc_date"] = headers.get("warc-date")
        rec["content_type"] = headers.get("content-type")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            rec["_corrupt_record"] = (
                f"missing/invalid Content-Length at offset {pos}"
            )
            yield rec
            return
        rec["content_length"] = length
        body_start = hdr_end + 4
        if body_start + length > n:
            rec["_corrupt_record"] = (
                f"truncated payload at offset {pos}: declared {length}, "
                f"{n - body_start} available"
            )
            yield rec
            return
        payload = data[body_start : body_start + length]
        ctype = (rec["content_type"] or "").lower()
        if "msgtype=response" in ctype:
            # an HTTP response capture: drop the HTTP header block,
            # honor its declared charset for the body
            split = payload.find(b"\r\n\r\n")
            http_hdrs = payload[: max(split, 0)]
            body = payload[split + 4 :] if split >= 0 else payload
            charset = "utf-8"
            for line in http_hdrs.split(b"\r\n"):
                low = line.lower()
                if low.startswith(b"content-type:") and b"charset=" in low:
                    charset = (
                        low.split(b"charset=", 1)[1]
                        .split(b";")[0].strip()
                        .decode("ascii", "replace")
                    )
        else:
            body, charset = payload, "utf-8"
        try:
            rec["text"] = body.decode(charset)
        except (UnicodeDecodeError, LookupError) as exc:
            rec["_corrupt_record"] = f"payload decode failed: {exc}"
        yield rec
        ix += 1
        pos = body_start + length


def warc_source(
    spark: SparkSession,
    path: str,
    *,
    record_types: Sequence[str] | None = ("response", "conversion"),
) -> DataFrame:
    """Web-archive (WARC / WET) scan → one typed row per record.

    The entry-point operator for real crawl corpora (Common Crawl and
    friends ship WARC for raw captures and WET for extracted text —
    both are ISO 28500 record streams). Columns: provenance
    (``source_file``, ``record_ix``, ``record_offset`` in the
    uncompressed stream), the standard WARC headers (``record_id``,
    ``record_type``, ``target_uri``, ``warc_date``, ``content_type``,
    ``content_length``), the decoded ``text`` payload, and the
    :func:`jsonl_source` quarantine convention: a malformed record or
    undecodable payload keeps its row with ``_corrupt_record`` set and
    ``text`` null — a dropped shard is worse than a quarantine table.
    HTTP ``response`` captures have their HTTP header block stripped
    and the body decoded per its declared charset; everything else
    (WET ``conversion`` records included) decodes as UTF-8.

    ``record_types`` keeps only those WARC-Types (default: the two
    content-bearing ones — ``warcinfo``/``request``/``metadata``
    records are framing); pass None to keep everything. Quarantined
    rows always survive the filter (their type may be unreadable).

    Scale shape: ``binaryFile`` scan → ``mapInPandas`` with a bounded
    per-batch yield. One row per FILE into the parser (gzip members
    are not splittable mid-stream, so the file is the parallelism
    unit — a crawl dump ships tens of thousands of ~1 GB files, which
    keeps every executor busy at 100 TB; ``binaryFile`` caps cells at
    2 GB, matching the ecosystem's shard-size convention). The parser
    is pure Python by necessity (record framing is imperative), but it
    runs once per FILE, not per document — per-record work downstream
    stays in column programs. Multi-member gzip (the per-record-member
    layout WARC writers use precisely so partial fetches can resync)
    decompresses in one pass. Peak per-task memory is the UNCOMPRESSED
    stream plus one Arrow batch (the record parser is a generator) —
    size executor-cores-per-task accordingly for ~1 GB-gz shards
    (~4-5 GB uncompressed each).
    """
    import pandas as pd  # executor-side import kept top-level-free

    def parse(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                raw = row["content"]
                if raw[:2] == b"\x1f\x8b":
                    import gzip

                    raw = gzip.decompress(raw)  # multi-member capable
                # stream records straight into bounded Arrow batches:
                # peak memory = uncompressed stream + ONE batch, never
                # stream + every decoded record (the parser yields)
                buf: list = []
                for rec in _parse_warc_member(bytes(raw), row["path"], 0):
                    buf.append(rec)
                    if len(buf) >= _WARC_BATCH_ROWS:
                        yield pd.DataFrame(buf)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf)

    out = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(parse, WARC_SCHEMA)
    )
    if record_types is not None:
        out = out.filter(
            F.col("record_type").isin(list(record_types))
            | F.col("_corrupt_record").isNotNull()
        )
    return out


def wet_source(spark: SparkSession, path: str) -> DataFrame:
    """WET extracted-text scan shaped for :func:`curate_documents`:
    (doc_id, url, fetch_time, text, _corrupt_record) — one row per
    ``conversion`` record, ``doc_id`` = the WARC record id (falling
    back to file:offset for quarantined rows missing one),
    ``fetch_time`` the parsed WARC-Date, ``url`` ready for the
    ``web.py`` domain operators (canonicalize_urls / domain caps)."""
    return warc_source(spark, path, record_types=("conversion",)).select(
        F.coalesce(
            F.col("record_id"),
            F.concat_ws(":", "source_file", "record_offset"),
        ).alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.to_timestamp("warc_date").alias("fetch_time"),
        "text",
        "_corrupt_record",
    )


def stage_source(
    spark: SparkSession, stage: str, path: str, *, separator: str = "\t"
) -> DataFrame:
    """Seed-stage reader dispatch (PipelineInput.tableAliasToTableReader,
    PipelineInput.groovy:33-63): ``variant`` uses the normalizing reader,
    every other seedable stage reads its declared header as-is."""
    if stage == "variant":
        return variant_source(spark, path, separator=separator)
    if stage not in INPUT_HEADERS:
        raise KeyError(
            f"no input reader for stage {stage!r}; seedable: "
            f"{sorted(INPUT_HEADERS)}"
        )
    hdr = INPUT_HEADERS[stage]
    df = dsv_source(spark, path, hdr, separator=separator)
    renames = {
        "SAMPLE_ID": "patient_id",
        "GENE": "gene_name",
        "PHENOTYPE": "phenotype_name",
        "HAPLOTYPE": "haplotype_name",
        "HAPLOTYPE1": "haplotype_name1",
        "HAPLOTYPE2": "haplotype_name2",
    }
    return df.withColumnsRenamed({c: renames[c] for c in hdr if c in renames})
