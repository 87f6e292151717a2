"""Compute kernels: limb fields, tower, curves, MSM, pairings."""
