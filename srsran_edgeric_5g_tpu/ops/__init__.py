"""Compute kernels: the TPU-native counterparts of the reference's
lib/phy/upper + lib/phy/lower component rows (SURVEY.md §2.1)."""
