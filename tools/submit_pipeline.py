"""spark-submit-able launcher for the ETL pipeline CLI.

spark-submit takes a script path (it has no `-m` module switch), so
the Airflow DAG points here; this shim just forwards argv to the
package CLI (`python -m data_engineering_for_e_commerce_logistics_spark`
remains the local-mode equivalent).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_for_e_commerce_logistics_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
