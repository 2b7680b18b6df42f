from etl_migrate_api_spark.pipelines.contact_job import ContactEtlJob, JobResult

__all__ = ["ContactEtlJob", "JobResult"]
