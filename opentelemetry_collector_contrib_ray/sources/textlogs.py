"""Raw text-line log source — the filelog receiver's input form (SURVEY.md
§2.1: tail files matching globs -> lines -> stanza parser DAG).

Batch mapping: ``ray.data.read_text`` over file globs (one row per line,
Ray handles splitting/parallelism), then the same vectorized parse stages
as the Parquet path. Include/exclude globs map to the path list; the
fingerprint/offset machinery maps to the partition manifests (state/).

``write_text_fixture`` materializes transcript text into plain .log files
(one per conversation group) so the text path is testable end-to-end
against the same oracle semantics.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from .transcripts import ensure_transcripts


def write_text_fixture(sf_dir: str, out_dir: str) -> str:
    """Dump the transcript `text` column into .log files (one per parquet
    part, order preserved) — a deterministic raw-log corpus."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    src = ensure_transcripts(sf_dir)
    for name in sorted(os.listdir(src)):
        if not name.endswith(".parquet"):
            continue
        out = os.path.join(out_dir, name.replace(".parquet", ".log"))
        if os.path.exists(out):
            continue
        t = pq.read_table(os.path.join(src, name), columns=["text"])
        # unique tmp per writer (concurrent builders; last os.replace wins)
        tmp = f"{out}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            for line in t["text"].to_pylist():
                f.write(line.replace("\n", "\\n") + "\n")
        os.replace(tmp, out)
    return out_dir


def split_tokens(data: bytes, *, line_start_re=None, line_end_re=None,
                 omit_pattern: bool = False,
                 newline: bytes = b"\n", carriage: bytes = b"\r",
                 flush_at_eof: bool = True) -> list[bytes]:
    """pkg/stanza/split semantics over one complete buffer (batch model:
    the whole file is available, so every token the streaming SplitFunc
    would eventually emit — including the flush-at-EOF tail — comes out
    in one pass).

    - line_start_pattern (split.go LineStartSplitFunc): tokens begin at
      each match; a non-matching prefix is its own token; the last token
      runs to EOF. ``omit_pattern`` drops the matched text from the token.
    - line_end_pattern (LineEndSplitFunc): tokens end at each match end
      (match start when omitted); the unterminated tail flushes at EOF.
    - neither (NewlineSplitFunc): newline split, trailing ``\\r``
      trimmed, unterminated tail flushed at EOF."""
    if line_start_re is not None and line_end_re is not None:
        raise ValueError(
            "only one of line_start_pattern or line_end_pattern can be set")
    if line_start_re is not None:
        spans = [m.span() for m in line_start_re.finditer(data)]
        if not spans:
            return [data] if data and flush_at_eof else []
        toks = []
        if spans[0][0] != 0:
            toks.append(data[:spans[0][0]])
        # without EOF flush the stream holds the final (unterminated)
        # segment — it only appears once a later match bounds it
        n_seg = len(spans) if flush_at_eof else len(spans) - 1
        for i in range(n_seg):
            s, e = spans[i]
            nxt = spans[i + 1][0] if i + 1 < len(spans) else len(data)
            toks.append(data[e if omit_pattern else s:nxt])
        return toks
    if line_end_re is not None:
        toks, pos = [], 0
        for m in line_end_re.finditer(data):
            s, e = m.span()
            toks.append(data[pos:s if omit_pattern else e])
            pos = e
        if pos < len(data) and flush_at_eof:
            toks.append(data[pos:])
        return toks
    toks = data.split(newline)
    tail = toks.pop()  # content after the last newline (b'' if terminated)
    out = [t[:-len(carriage)] if t.endswith(carriage) else t for t in toks]
    if tail and flush_at_eof:
        out.append(tail)
    return out


def _trim(tok: str, preserve_leading: bool, preserve_trailing: bool) -> str:
    """pkg/stanza/trim defaults: whitespace trimmed both sides unless
    preserved (trim.go Whitespace/Leading/Trailing; charset '\\r\\n\\t ')."""
    if not preserve_trailing:
        tok = tok.rstrip("\r\n\t ")
    if not preserve_leading:
        tok = tok.lstrip("\r\n\t ")
    return tok


def _encoded(pattern: str | None, encoding: str):
    if pattern is None:
        return None
    import re
    return re.compile(pattern.encode(encoding), re.MULTILINE)


def read_text_logs(paths: str | list[str],
                   file_extensions: list[str] | None = None, *,
                   encoding: str = "utf-8",
                   line_start_pattern: str | None = None,
                   line_end_pattern: str | None = None,
                   omit_pattern: bool = False,
                   preserve_leading_whitespaces: bool = False,
                   preserve_trailing_whitespaces: bool = False,
                   max_log_size: int = 0,
                   include_file_record_number: bool = False) -> ray.data.Dataset:
    """fileconsumer-shape text source: files -> entry tokens with the
    reference's split/trim/encoding config (fileconsumer/config.go:76-90,
    pkg/stanza/split, pkg/stanza/trim).

    Plain newline UTF-8 logs stream through ``ray.data.read_text`` (Ray
    splits within files — scale path). Multiline patterns, non-UTF-8
    encodings and record numbers need file-contained split state, so those
    route through ``read_binary_files`` — ONE file per task, the same
    partitioning unit as the reference's per-file reader goroutine; at
    cluster scale parallelism comes from file count, which is how log
    corpora arrive.

    ``encoding='nop'`` mirrors split.go NoSplitFunc: raw bytes chunked at
    ``max_log_size`` (required), emitted in a binary ``text`` column."""
    multiline = (line_start_pattern is not None
                 or line_end_pattern is not None)
    if encoding == "nop":
        if multiline:
            raise ValueError(
                "line_start_pattern/line_end_pattern should not be set "
                "when using nop encoding")
        if max_log_size <= 0:
            raise ValueError("nop encoding requires max_log_size")
    fast = (not multiline and not include_file_record_number
            and encoding != "nop"
            and encoding.lower().replace("-", "") in ("utf8", "ascii",
                                                      "usascii"))
    if fast:
        ds = ray.data.read_text(paths, include_paths=True,
                                file_extensions=file_extensions or ["log"])

        def shape(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            txt = batch["text"]
            if not preserve_trailing_whitespaces:
                txt = pc.utf8_rtrim(txt, "\r\n\t ")
            if not preserve_leading_whitespaces:
                txt = pc.utf8_ltrim(txt, "\r\n\t ")
            return pa.table({"text": txt, "source_file": batch["path"]})

        return ds.map_batches(shape, batch_format="pyarrow", batch_size=None)

    start_re = _encoded(line_start_pattern,
                        encoding if encoding != "nop" else "utf-8")
    end_re = _encoded(line_end_pattern,
                      encoding if encoding != "nop" else "utf-8")
    nl = "\n".encode(encoding) if encoding != "nop" else b"\n"
    cr = "\r".encode(encoding) if encoding != "nop" else b"\r"

    ds = ray.data.read_binary_files(
        paths, include_paths=True,
        file_extensions=file_extensions or ["log"])

    def split_files(batch: pa.Table) -> pa.Table:
        texts, files, recnos = [], [], []
        for path, blob in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            if encoding == "nop":
                toks = [blob[i:i + max_log_size]
                        for i in range(0, len(blob), max_log_size)]
            else:
                toks = split_tokens(blob, line_start_re=start_re,
                                    line_end_re=end_re,
                                    omit_pattern=omit_pattern,
                                    newline=nl, carriage=cr)
                if max_log_size > 0:  # trim.ToLength: truncate BYTES
                    toks = [t[:max_log_size] for t in toks]
                toks = [_trim(t.decode(encoding, errors="replace"),
                              preserve_leading_whitespaces,
                              preserve_trailing_whitespaces) for t in toks]
            texts.extend(toks)
            files.extend([path] * len(toks))
            recnos.extend(range(1, len(toks) + 1))
        cols = {
            "text": pa.array(texts, pa.large_binary() if encoding == "nop"
                             else pa.string()),
            "source_file": pa.array(files, pa.string()),
        }
        if include_file_record_number:
            cols["log.file.record_number"] = pa.array(recnos, pa.int64())
        return pa.table(cols)

    return ds.map_batches(split_files, batch_format="pyarrow",
                          batch_size=None)
