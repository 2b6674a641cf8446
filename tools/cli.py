"""spark-submit launcher for the package CLI:

    spark-submit --py-files scribe_js_spark.zip tools/cli.py extract IN OUT
"""

import sys

from scribe_js_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
