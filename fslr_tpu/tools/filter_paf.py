"""Standalone PAF filter (stdin -> stdout) for all-vs-all read overlap QC.

Capability parity with /root/reference/fslr/filter_paf.py:1-37: drops
self-hits, requires query and target coverage >= argv[1] and
matching-bases/length >= 0.5 on both sides; prints kept/input counts to
stderr.

Usage: minimap2 -x ava-ont reads.fq reads.fq | python -m
fslr_tpu.tools.filter_paf 0.8 > filtered.paf
"""

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    min_cov = float(argv[0])
    i = 0
    c = 0
    for r in sys.stdin:
        i += 1
        d = r.strip().split('\t')
        if d[0] == d[5]:
            continue  # same name

        matching_bases = int(d[9])
        ql = int(d[1])
        qs = int(d[2])
        qe = int(d[3])
        tl = int(d[6])
        ts = int(d[7])
        te = int(d[8])
        query_coverage = (qe - qs) / ql
        target_coverage = (te - ts) / tl

        if query_coverage < min_cov or \
                target_coverage < min_cov or \
                (matching_bases / ql) < 0.5 or \
                (matching_bases / tl) < 0.5:
            continue
        sys.stdout.write(r)
        c += 1

    print(f'Input alignmnets: {i}, kept alignments {c}', file=sys.stderr)


if __name__ == '__main__':
    main()
