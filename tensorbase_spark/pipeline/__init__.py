"""Large-scale training-data pipeline operators (beyond the reference's own
surface; see the build brief): deduplication, similarity search, text
analysis, multimodal columns.

Everything here is DataFrame-native (JVM expressions, whole-stage codegen)
except the explicitly-Pandas multimodal decode path, and is designed for the
100 TB regime: token explosion shuffles on near-uniform hash keys, candidate
generation is blocked/banded so no O(n^2) stage exists, and every
verification join carries only bounded per-doc state (token arrays, 64-dim
vectors, 64-bit fingerprints).
"""
