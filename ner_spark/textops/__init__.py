"""Large-scale training-data pipeline ops over a documents corpus."""
