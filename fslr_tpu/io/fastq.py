"""FASTQ / FASTA reading and writing (host I/O edge).

Self-contained replacement for the reference's pysam.FastxFile usage
(fslr/filter_junk_from_fq.py:125, fslr/find_reads_with_primers.py:79): parses
FASTQ and FASTA, transparently decompresses ``.gz``, and renders records back
in the same format pysam does (``@name comment\\nseq\\n+\\nqual`` for FASTQ,
``>name comment\\nseq`` for FASTA), which is what the reference writes with
``str(record)``.
"""

from __future__ import annotations

import dataclasses
import gzip
import io
import os
from typing import Iterable, Iterator


@dataclasses.dataclass
class FastxRecord:
    name: str
    sequence: str
    quality: str | None = None     # None for FASTA records
    comment: str | None = None

    def __str__(self) -> str:
        head = self.name if not self.comment else f'{self.name} {self.comment}'
        if self.quality is None:
            return f'>{head}\n{self.sequence}'
        return f'@{head}\n{self.sequence}\n+\n{self.quality}'

    def __len__(self) -> int:
        return len(self.sequence)


def _open_text(path: str) -> io.TextIOBase:
    if path.endswith('.gz'):
        return io.TextIOWrapper(
            io.BufferedReader(gzip.open(path, 'rb'), buffer_size=1 << 20))
    return open(path, 'rt', buffering=1 << 20)


def _split_header(line: str) -> tuple[str, str | None]:
    head = line[1:].rstrip('\n')
    if ' ' in head:
        name, comment = head.split(' ', 1)
        return name, comment
    if '\t' in head:
        name, comment = head.split('\t', 1)
        return name, comment
    return head, None


def read_fastx(path: str) -> Iterator[FastxRecord]:
    """Iterate records from a FASTQ/FASTA file (optionally gzipped).

    This is the string-record interface; batch consumers that want encoded
    arrays without per-read string work should use the native columnar
    parser (io/native.parse_fastx) directly.  Set FSLR_NATIVE=1 to route
    this interface through the native parser too (it normalizes non-ACGT
    symbols to N).
    """
    if os.environ.get('FSLR_NATIVE'):
        try:
            from fslr_tpu.io.native import parse_fastx
            fa = parse_fastx(path)
        except Exception:
            fa = None
        if fa is not None:
            yield from _iter_native(fa)
            return
    yield from _read_fastx_py(path)


_DECODE_TABLE = None


def _iter_native(fa) -> Iterator[FastxRecord]:
    global _DECODE_TABLE
    import numpy as np
    if _DECODE_TABLE is None:
        _DECODE_TABLE = np.frombuffer(b'ACGTN', dtype=np.uint8)
    for i in range(fa.n):
        codes = fa.seq_codes(i)
        raw = _DECODE_TABLE[codes] | (fa.lower_mask(i) << 5)
        yield FastxRecord(name=fa.name(i),
                          sequence=raw.tobytes().decode('ascii'),
                          quality=fa.qual(i), comment=fa.comment(i))


def _read_fastx_py(path: str) -> Iterator[FastxRecord]:
    with _open_text(path) as fh:
        first = fh.read(1)
        if not first:
            return
        if first == '@':
            # FASTQ
            line = first + fh.readline()
            while line:
                name, comment = _split_header(line)
                seq = fh.readline().rstrip('\n')
                fh.readline()  # '+'
                qual = fh.readline().rstrip('\n')
                yield FastxRecord(name=name, sequence=seq, quality=qual,
                                  comment=comment)
                line = fh.readline()
        elif first == '>':
            line = first + fh.readline()
            while line:
                name, comment = _split_header(line)
                parts = []
                line = fh.readline()
                while line and not line.startswith('>'):
                    parts.append(line.rstrip('\n'))
                    line = fh.readline()
                yield FastxRecord(name=name, sequence=''.join(parts),
                                  quality=None, comment=comment)
        else:
            raise ValueError(f'{path}: not FASTA/FASTQ (starts with {first!r})')


def write_fastx(path: str, records: Iterable[FastxRecord]) -> int:
    n = 0
    with open(path, 'w', buffering=1 << 20) as fh:
        for rec in records:
            fh.write(str(rec))
            fh.write('\n')
            n += 1
    return n


def glob_input_files(folder: str) -> list[str]:
    """Input file discovery with the same extension set and glob ordering as
    the reference (fslr/main.py:85-87)."""
    import glob as _glob
    exts = ['*.fq.gz', '*.fq', '*.fastq.gz', '*.fastq', '*.fasta', '*.fa',
            '*.fasta.gz', '*.fa.gz']
    out: list[str] = []
    for e in exts:
        out.extend(_glob.glob(os.path.join(folder, e)))
    return out
