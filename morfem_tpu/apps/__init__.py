"""Application layers: the waveguide example and parameter studies."""
