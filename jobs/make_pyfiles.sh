#!/bin/sh
# Build the --py-files zip for spark-submit (imc package + fixtures helpers).
set -e
cd "$(dirname "$0")/.."
rm -f imc.zip
zip -qr imc.zip imc fixtures -x 'fixtures/data/*' -x '*__pycache__*'
echo "wrote $(pwd)/imc.zip"
