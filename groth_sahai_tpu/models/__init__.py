"""The Groth-Sahai protocol layer: statements, CRS, commit, prove, verify."""
