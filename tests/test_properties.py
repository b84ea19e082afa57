"""Property-based tests (hypothesis) over the engine's PURE functions —
the checks SURVEY.md §5 calls out: dedup tiling/threshold invariants, JSONB
containment laws, stack squeeze semantics. All driver-side (no Spark jobs),
so hundreds of examples run in seconds."""

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from imagingdb_spark import sinks
from imagingdb_spark.multimodal import squeeze_stack
from imagingdb_spark.operators.similarity import _embed_block_pairs


class TestPrefixArithmetic:
    """x_dedup_jaccard's integer prefix length: floor((4n+4)/5) must equal
    ceil(0.8*n) for every set size — the f64 form is off-by-one at
    multiples of 5 (dedup.py docstring), which silently drops true pairs."""

    @given(st.integers(min_value=1, max_value=10**9))
    def test_integer_ceil_matches_exact_rational(self, n):
        assert (4 * n + 4) // 5 == math.ceil(4 * n / 5)


class TestEmbedTiling:
    """Tiling is a memory layout, not an approximation: any matrix, any
    tile size, any threshold → identical pair set to the one-shot gram."""

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(min_value=2, max_value=24),
        dim=st.integers(min_value=2, max_value=8),
        tile=st.integers(min_value=1, max_value=30),
        thr=st.floats(min_value=-0.5, max_value=0.9),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_tiled_equals_one_shot(self, n, dim, tile, thr, seed):
        rng = np.random.default_rng(seed)
        pdf = pd.DataFrame(
            {
                "vec_id": np.arange(n),
                "label": np.full(n, np.int32(1)),
                "embedding": list(rng.normal(size=(n, dim)) + 0.01),
            }
        )
        a = _embed_block_pairs(pdf, thr, tile=10**9)
        b = _embed_block_pairs(pdf, thr, tile=tile)
        key = lambda df: sorted(
            zip(df["vec_a"], df["vec_b"], np.round(df["cosine_sim"], 9))
        )
        assert key(a) == key(b)


json_scalars = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.text(max_size=8),
    st.booleans(),
    st.none(),
)
json_docs = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=6), children, max_size=4),
    ),
    max_leaves=12,
)


class TestJsonContainment:
    """Postgres `@>` laws: reflexivity (every object contains itself),
    monotonicity (dropping needle keys preserves containment), and the
    empty needle is contained in every object."""

    @settings(max_examples=100, deadline=None)
    @given(st.dictionaries(st.text(max_size=6), json_docs, max_size=4))
    def test_reflexive(self, doc):
        import json

        assert sinks.json_contains(json.dumps(doc), doc)

    @settings(max_examples=100, deadline=None)
    @given(
        st.dictionaries(st.text(min_size=1, max_size=6), json_docs, min_size=1, max_size=4),
        st.randoms(use_true_random=False),
    )
    def test_sub_needle_still_contained(self, doc, rnd):
        import json

        keys = sorted(doc)
        sub = {k: doc[k] for k in keys[: max(1, len(keys) // 2)]}
        assert sinks.json_contains(json.dumps(doc), sub)

    @settings(max_examples=50, deadline=None)
    @given(st.dictionaries(st.text(max_size=6), json_docs, max_size=4))
    def test_empty_needle_always_contained(self, doc):
        import json

        assert sinks.json_contains(json.dumps(doc), {})


class TestSqueezeStack:
    """squeeze_stack drops exactly the singleton dims and the dim string
    tracks the survivors in XYGZCTP order (data_storage.py:68-85)."""

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=3), min_size=7, max_size=7))
    def test_shape_and_dim_string(self, dims):
        stack = np.zeros(dims)
        squeezed, dim_str = squeeze_stack(stack)
        expected = [("XYGZCTP"[i], d) for i, d in enumerate(dims) if d > 1]
        assert dim_str == "".join(n for n, _ in expected)
        assert squeezed.shape == tuple(d for _, d in expected)


class TestCodecRoundTrips:
    """The round-3 codecs are pure byte functions — property-test the
    round trips over arbitrary shapes/values, not just fixed examples."""

    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
        st.sampled_from(["uint8", "uint16"]),
        st.sampled_from([1, 3]),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_png_roundtrip_any_shape(self, h, w, dtype, channels, seed):
        from imagingdb_spark import png

        r = np.random.default_rng(seed)
        shape = (h, w) if channels == 1 else (h, w, 3)
        im = r.integers(0, np.iinfo(dtype).max, size=shape, endpoint=True).astype(dtype)
        back = png.decode_png(png.encode_png(im))
        # encode squeezes singleton dims first (reference serialize_im
        # parity, image_utils.py:17), so the round-trip invariant is
        # against the squeezed input (lifted to 2-D if squeeze went below)
        want = np.squeeze(im)
        if want.ndim < 2:
            want = want.reshape(1, -1)
        np.testing.assert_array_equal(back, want)

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=12),
                st.integers(min_value=1, max_value=12),
            ),
            min_size=1,
            max_size=5,
        ),
        st.sampled_from(["uint8", "uint16"]),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_tiff_multipage_roundtrip_any_shapes(self, dims, dtype, seed):
        from imagingdb_spark import tiff

        r = np.random.default_rng(seed)
        pages = [
            r.integers(0, np.iinfo(dtype).max, size=d, endpoint=True).astype(dtype)
            for d in dims
        ]
        back = tiff.read_tiff_pages(tiff.write_tiff(pages))
        assert len(back) == len(pages)
        for got, want in zip(back, pages):
            np.testing.assert_array_equal(got, want)

    @given(
        st.integers(min_value=1, max_value=2048),
        st.integers(min_value=1, max_value=4),
        st.sampled_from([8000, 16000, 44100]),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_wav_pcm16_roundtrip_bounded_error(self, n, channels, rate, seed):
        from imagingdb_spark import wav

        r = np.random.default_rng(seed)
        shape = (n,) if channels == 1 else (n, channels)
        a = r.uniform(-1.0, 1.0, size=shape)
        back, got_rate, got_ch = wav.decode_wav(wav.encode_wav(a, rate))
        assert got_rate == rate and got_ch == channels
        assert back.shape == a.shape
        # encode rounds a*32767, decode divides by 32768: worst case
        # (|a| + 0.5) / 32768 <= 1.5/32768
        assert np.abs(back - a).max() <= 1.5 / 32768 + 1e-9


class TestLzwRoundTrip:
    """TIFF LZW codec laws: decode(encode(x)) == x for ARBITRARY byte
    strings — including table-reset streams and every early-change
    boundary hypothesis can find."""

    @given(st.binary(min_size=0, max_size=4096))
    @settings(max_examples=200, deadline=None)
    def test_involutive(self, data):
        from imagingdb_spark.tiff import _lzw_decode, _lzw_encode

        assert _lzw_decode(_lzw_encode(data)) == data

    @given(st.integers(min_value=0, max_value=6), st.integers(0, 2**32 - 1))
    @settings(max_examples=50, deadline=None)
    def test_involutive_on_low_entropy_runs(self, nsyms, seed):
        """Highly repetitive inputs grow the table fastest — the
        mid-stream Clear path."""
        from imagingdb_spark.tiff import _lzw_decode, _lzw_encode

        rng = np.random.default_rng(seed)
        data = rng.integers(0, nsyms + 1, 20000).astype(np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data)) == data


class TestG711Laws:
    @given(st.integers(min_value=-32768, max_value=32767))
    @settings(max_examples=300, deadline=None)
    def test_mulaw_quantization_bounded(self, x):
        """|decode(encode(x)) - x| is bounded by half the segment step at
        |x| (log companding's defining property), and sign is preserved."""
        from imagingdb_spark.wav import mulaw_decode, mulaw_encode

        y = int(mulaw_decode(mulaw_encode(np.array([x])))[0])
        mag = min(abs(x), 32635)
        # segment k covers biased magnitudes in [2^(k+8), 2^(k+9)) with
        # quantization step 8*2^k -> k = bit_length(mag+132) - 9, and the
        # clip at 32635 adds at most 32767-32635 further error
        seg_step = 8 << max(0, (mag + 132).bit_length() - 9)
        assert abs(y - x) <= seg_step + 132 + (32767 - 32635)
        if abs(x) > 200:
            assert (y >= 0) == (x >= 0)

    @given(st.integers(min_value=-32768, max_value=32767))
    @settings(max_examples=300, deadline=None)
    def test_alaw_idempotent_fixed_point(self, x):
        """encode∘decode is a projection: applying it twice equals once
        (every companded byte decodes to a codebook value that re-encodes
        to itself)."""
        from imagingdb_spark.wav import alaw_decode, alaw_encode

        b1 = alaw_encode(np.array([x]))
        v1 = alaw_decode(b1)
        b2 = alaw_encode(v1)
        assert bytes(b1) == bytes(b2) or int(v1[0]) == 0


class TestSubstringDedupProperty:
    """x_substring_dedup vs an INDEPENDENT direct-extension twin on
    repetition-heavy random corpora (vocab of 4 letters forces repeated
    and periodic seeds — the stress case for the gaps-and-islands run
    reconstruction). The twin computes shared runs by brute-force longest
    common extension at every alignment, then mirrors the occurrence-cap
    semantics by dropping capped seed positions before reconstructing
    runs — a different algorithm arriving at the same answer."""

    @staticmethod
    def _twin(token_lists, L, cap):
        from collections import defaultdict

        # seed occurrences, global cap
        occ = defaultdict(list)
        for d, toks in token_lists.items():
            for i in range(len(toks) - L + 1):
                occ[tuple(toks[i : i + L])].append((d, i))
        ok = {s for s, o in occ.items() if 2 <= len(o) <= cap}
        # islands per (pair, delta) over SURVIVING seed positions —
        # reconstructed directly from per-pair matched-position sets,
        # not via window functions
        out = {}
        docs = sorted(token_lists)
        for ai in range(len(docs)):
            for bi in range(ai + 1, len(docs)):
                a, b = docs[ai], docs[bi]
                ta, tb = token_lists[a], token_lists[b]
                matched = defaultdict(set)  # delta -> set of pa
                for i in range(len(ta) - L + 1):
                    if tuple(ta[i : i + L]) not in ok:
                        continue
                    for j in range(len(tb) - L + 1):
                        if ta[i : i + L] == tb[j : j + L]:
                            matched[j - i].add(i)
                runs = []
                for delta, pas in matched.items():
                    for p in pas:
                        if p - 1 not in pas:  # island start
                            k = p
                            while k + 1 in pas:
                                k += 1
                            runs.append(L + (k - p))
                if runs:
                    out[(a, b)] = (max(runs), len(runs))
        return out

    def test_matches_direct_extension_twin(self, spark, tmp_path):
        import random

        from imagingdb_spark.operators.dedup import (
            SUBSTR_OCC_CAP,
            SUBSTR_SEED_TOKENS,
            x_substring_dedup,
        )

        rng = random.Random(42)
        for trial in range(3):
            n_docs = rng.randint(3, 6)
            token_lists = {
                d: [rng.choice("abcd") for _ in range(rng.randint(0, 40))]
                for d in range(n_docs)
            }
            d_path = str(tmp_path / f"sfprop{trial}")
            spark.createDataFrame(
                [
                    (d, " ".join(toks), "en", "src0", len(toks))
                    for d, toks in token_lists.items()
                ],
                "doc_id long, text string, lang string, source string, n_chars long",
            ).coalesce(1).write.parquet(d_path + "/documents.parquet")
            got = {
                (r["doc_a"], r["doc_b"]): (r["max_shared_run"], r["n_runs"])
                for r in x_substring_dedup(spark, d_path).collect()
            }
            expect = self._twin(
                token_lists, SUBSTR_SEED_TOKENS, SUBSTR_OCC_CAP
            )
            assert got == expect, f"trial {trial}"
