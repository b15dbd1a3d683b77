#!/bin/bash
# Build the reference C extension out-of-tree at /tmp/refbuild so the
# differential tests (tests/test_reference_differential.py) and the on-TPU
# parity sweep (tools/tpu_parity.py) can import `elasticdeform`.  /tmp is
# wiped between sessions — run this first in any script that needs the
# reference.  Never writes to /root/reference.
set -e
if python -c "import sys; sys.path.insert(0, '/tmp/refbuild'); import elasticdeform; assert elasticdeform.__file__.startswith('/tmp/refbuild'), elasticdeform.__file__" 2>/dev/null; then
    echo "refbuild: already importable from /tmp/refbuild"
    exit 0
fi
rm -rf /tmp/refbuild
cp -r /root/reference /tmp/refbuild
(cd /tmp/refbuild && python setup.py build_ext --inplace >/dev/null)
python -c "import sys; sys.path.insert(0, '/tmp/refbuild'); import elasticdeform; print('refbuild: OK')"
