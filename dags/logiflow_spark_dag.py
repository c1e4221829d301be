"""Airflow DAG — the scheduled-orchestration twin of the reference's
dags/etl_pipeline_dag.py (daily 02:00, retries with exponential
backoff, extract → transform+validate+load), adapted to Spark jobs.

Differences from the reference by design (SURVEY §2.10 O5):
* inter-task hand-off via parquet checkpoint dirs, not re-parsed CSV —
  the DAG's tasks submit ONE Spark job running the lazily-composed
  pipeline (plans/pipeline.py), rather than materializing each stage;
* the validation gate lives inside the job (critical failures abort
  with a non-zero exit the scheduler retries/alerts on).

Import-guarded: this container has no Airflow; the module is inert
without it and the `python -m data_engineering_for_e_commerce_logistics_spark`
CLI remains the spark-submit-able unit either way.
"""

from __future__ import annotations

try:
    from datetime import datetime, timedelta

    from airflow import DAG
    from airflow.operators.bash import BashOperator

    default_args = {
        "owner": "data-engineering",
        "retries": 3,
        "retry_delay": timedelta(minutes=5),
        "retry_exponential_backoff": True,
        "max_retry_delay": timedelta(minutes=30),
    }

    with DAG(
        dag_id="logiflow_spark_etl",
        schedule="0 2 * * *",  # daily 02:00, as the reference
        start_date=datetime(2026, 1, 1),
        catchup=False,
        max_active_runs=1,
        default_args=default_args,
        tags=["logiflow", "spark"],
    ) as dag:
        run_pipeline = BashOperator(
            task_id="run_etl_pipeline",
            # spark-submit takes a script path (no `-m` module switch);
            # tools/submit_pipeline.py forwards argv to the package CLI.
            bash_command=(
                "spark-submit --master {{ var.value.spark_master }} "
                "{{ var.value.logiflow_repo }}/tools/submit_pipeline.py "
                "--sf-dir {{ var.value.logiflow_input_dir }} "
                "--output {{ var.value.logiflow_warehouse_dir }}"
            ),
        )

        refresh_rollups = BashOperator(
            task_id="refresh_streaming_rollups",
            bash_command=(
                "spark-submit --master {{ var.value.spark_master }} "
                "{{ var.value.logiflow_repo }}/tools/run_rollup_stream.py"
            ),
        )

        run_pipeline >> refresh_rollups

except ImportError:  # Airflow not installed — module stays importable
    dag = None
