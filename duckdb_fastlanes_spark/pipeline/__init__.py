"""Large-scale training-data pipeline operators (beyond the reference surface).

BASELINE.json north star: dedup, similarity search, multimodal columns, text
analysis — each designed for 100 TB scale (partition-parallel, no driver-side
materialization, broadcast only for provably-small sides).
"""
