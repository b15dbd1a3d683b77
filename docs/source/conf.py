# Sphinx configuration for elasticdeform-tpu
# (mirrors the reference's autodoc setup, reference docs/source/conf.py,
#  with the JAX/TPU-specific modules mocked for doc builds)

import os
import sys
from unittest import mock

sys.path.insert(0, os.path.abspath('../..'))

# mock heavy/optional dependencies so docs build anywhere
for mod in ('torch', 'tensorflow'):
    if mod not in sys.modules:
        try:
            __import__(mod)
        except ImportError:
            sys.modules[mod] = mock.MagicMock()

project = 'elasticdeform-tpu'
copyright = '2026'
author = 'elasticdeform-tpu contributors'
release = '0.1.0'

extensions = [
    'sphinx.ext.autodoc',
    'sphinx.ext.napoleon',
    'sphinx.ext.viewcode',
]

autodoc_member_order = 'bysource'
html_theme = 'alabaster'
exclude_patterns = []
