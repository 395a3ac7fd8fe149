"""CTR model zoo: Wide&Deep, DeepFM, DCN, multitable Wide&Deep."""
