# Sphinx configuration for morfem_tpu
# (counterpart of the reference's docs/source/conf.py:1-27)

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "morfem_tpu"
copyright = "2026, morfem_tpu authors"
author = "morfem_tpu authors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]

templates_path = ["_templates"]
exclude_patterns = []

html_theme = "alabaster"
html_static_path = ["_static"]
