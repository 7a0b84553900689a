"""Deterministic synthetic change-event stream — the GenerateData (O4) analog
re-aimed at the CDC north rule's input shape.

The reference source (GenerateData.java:180-233) emits N synthetic CSV rows
per trigger from a rowlayout spec with no determinism guarantee. Here the
generator is a seeded, block-parallel Ray Data source producing the
``BASELINE.json.input_hint`` table::

    (repo: string, path: string, commit: string, lang: string,
     content: string, op: string, seq: int64 [, author: string])

All randomness is **counter-based**: every value is a pure function of
``(seed, seq, stream_id)`` via a vectorized splitmix64, so any block/batch
partitioning of the event range yields byte-identical rows — the property
the exactly-once replay tests rely on (FIXTURES.md F1).

Distribution shape: Zipf-skewed repo popularity (hot repos exercise salted
hot-key handling), paths revisited across the stream (upsert chains per
``(repo, path)``), ~``delete_frac`` tombstones, log-normal content length,
and optional additive schema evolution (``author`` column from a threshold
``seq`` on).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_M = np.uint64(0xFFFFFFFFFFFFFFFF)
_LANGS = np.array(["py", "java", "ts", "go", "rs", "md"])
_VOCAB = np.array(
    [
        "def", "return", "import", "class", "self", "value", "index", "buffer",
        "stream", "table", "batch", "commit", "merge", "delta", "apply", "state",
        "partition", "schema", "column", "record", "engine", "worker", "actor",
        "shuffle", "lineage", "epoch", "manifest", "offset", "replay", "upsert",
        "tombstone", "checkpoint", "hash", "router", "window", "vector", "token",
    ]
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG construction)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M
    return x ^ (x >> np.uint64(31))


def _rand_u64(seqs: np.ndarray, seed: int, stream: int) -> np.ndarray:
    mask = (1 << 64) - 1
    base = seqs.astype(np.uint64) * np.uint64(0x2545F4914F6CDD1D)
    base = base + np.uint64((seed * 0x9E3779B97F4A7C15) & mask)
    base = base + np.uint64((stream * 0xD6E8FEB86659FD93) & mask)
    return _splitmix64(base & _M)


def _rand_uniform(seqs, seed, stream) -> np.ndarray:
    return _rand_u64(seqs, seed, stream).astype(np.float64) / 2.0**64


def change_stream_batch(
    start: int,
    count: int,
    *,
    seed: int = 42,
    n_repos: int = 50,
    paths_per_repo: int = 200,
    delete_frac: float = 0.1,
    zipf_a: float = 1.3,
    content_tokens_mean: int = 40,
    author_from: int | None = None,
) -> pa.Table:
    """Generate events [start, start+count) — pure function of the params."""
    seqs = np.arange(start, start + count, dtype=np.int64)

    # Zipf-skewed repo choice via inverse CDF over bounded ranks
    ranks = np.arange(1, n_repos + 1, dtype=np.float64)
    pmf = ranks ** (-zipf_a)
    cdf = np.cumsum(pmf / pmf.sum())
    repo_ids = np.searchsorted(cdf, _rand_uniform(seqs, seed, 1), side="right")
    repo_ids = np.minimum(repo_ids, n_repos - 1)

    path_ids = _rand_u64(seqs, seed, 2) % np.uint64(paths_per_repo)
    lang_ids = (path_ids % np.uint64(len(_LANGS))).astype(np.int64)
    is_delete = _rand_uniform(seqs, seed, 3) < delete_frac

    # log-normal token count via Box-Muller on two uniform streams,
    # clipped so a tail row can't blow up batch memory
    u1 = np.clip(_rand_uniform(seqs, seed, 4), 1e-12, 1.0)
    u2 = _rand_uniform(seqs, seed, 5)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    ntok = np.exp(np.log(content_tokens_mean) + 0.6 * z).astype(np.int64)
    ntok = np.clip(ntok, 3, content_tokens_mean * 16)

    c1, c2, c3 = (_rand_u64(seqs, seed, s) for s in (6, 7, 8))
    commits = [f"{a:016x}{b:016x}{c:016x}"[:40] for a, b, c in
               zip(c1.tolist(), c2.tolist(), c3.tolist())]

    # contents fully vectorized: flat token-id array (base hash + positional
    # LCG step), vocab gather, then ONE Arrow list-join per batch — no
    # per-row Python and no (rows x max_tok) matrix
    base = _rand_u64(seqs, seed, 9)
    total = int(ntok.sum())
    offsets = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(ntok, out=offsets[1:])
    pos = np.arange(total, dtype=np.uint64) - np.repeat(
        offsets[:-1], ntok
    ).astype(np.uint64)
    flat_base = np.repeat(base, ntok)
    flat = ((flat_base + pos * np.uint64(0x9E3779B97F4A7C15)) & _M) >> np.uint64(40)
    flat_ids = (flat % np.uint64(len(_VOCAB))).astype(np.int64)
    flat_words = pa.array(_VOCAB[flat_ids], pa.string())
    if isinstance(flat_words, pa.ChunkedArray):
        flat_words = flat_words.combine_chunks()
    body = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat_words),
        " ",
    )
    suffix = pa.array(np.char.add("seq", seqs.astype("U20")).tolist(), pa.string())
    contents = pc.binary_join_element_wise(body, suffix, " ")

    repos = np.char.add(
        np.char.add("org", (repo_ids % 7).astype("U1")),
        np.char.add("/repo", repo_ids.astype("U6")),
    )
    langs = _LANGS[lang_ids]
    p = path_ids.astype(np.int64)
    paths = [
        f"src/m{pp // 100}/f{pp % 100}.{l}" for pp, l in zip(p.tolist(), langs.tolist())
    ]

    tbl = pa.table(
        {
            "repo": pa.array(repos.tolist(), pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "content": contents,
            "op": pa.array(np.where(is_delete, "delete", "upsert").tolist(), pa.string()),
            "seq": pa.array(seqs),
        }
    )
    if author_from is not None:
        aid = _rand_u64(seqs, seed, 10) % np.uint64(97)
        authors = pa.array(
            [f"author{a}" if s >= author_from else None
             for a, s in zip(aid.tolist(), seqs.tolist())],
            pa.string(),
        )
        tbl = tbl.append_column("author", authors)
    return tbl


def change_stream(
    n_events: int,
    *,
    start: int = 0,
    num_blocks: int | None = None,
    **gen_kwargs,
):
    """Change events [start, start+n_events) as a streaming Dataset:
    ``ray.data.range`` over event indices + one vectorized generator call per
    batch (never per row). Because generation is counter-based, the result
    is identical for every choice of ``num_blocks`` / batch size."""
    import ray.data as rd

    kwargs = {}
    if num_blocks:
        kwargs["override_num_blocks"] = num_blocks

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"]
        lo = pc.min(ids).as_py()
        n = len(ids)
        # range blocks are contiguous slices; assert to catch engine changes
        assert pc.max(ids).as_py() - lo + 1 == n, "non-contiguous range block"
        return change_stream_batch(start + lo, n, **gen_kwargs)

    return rd.range(n_events, **kwargs).map_batches(
        gen, batch_format="pyarrow", zero_copy_batch=True
    )


def expected_snapshot(events: pa.Table, key_cols=("repo", "path"), seq_col="seq",
                      op_col="op") -> pa.Table:
    """Independent (non-Ray, non-lake) reference final state: plain pyarrow
    group-by-max-seq, drop deletes. The oracle for the lake's replay result
    (SURVEY.md §5 / north-rule sha256 check)."""
    key_cols = list(key_cols)
    winners = events.select(key_cols + [seq_col]).group_by(key_cols).aggregate(
        [(seq_col, "max")]
    ).rename_columns(key_cols + [seq_col])
    latest = events.join(winners, keys=key_cols + [seq_col], join_type="inner")
    live = latest.filter(pc.not_equal(latest[op_col], "delete"))
    return live.sort_by([(k, "ascending") for k in key_cols])
