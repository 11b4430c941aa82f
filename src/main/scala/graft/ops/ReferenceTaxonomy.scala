package graft.ops

/** The reference's REAL skill dictionary, ported verbatim as DATA (not
  * code): the 16-category / 348-term taxonomy from
  * pracuj_scraper.py:25-42 (category order = Python dict insertion order,
  * which drives first-match-wins resolution) and the variation → canonical
  * map from pracuj_scraper.py:204-214 (additive: a variation match emits
  * both the raw term and the canonical skill). The matching engine itself
  * is [[SkillOps.matchesWith]]; this object only carries the dictionary.
  */
object ReferenceTaxonomy {

  val categories: Seq[(String, Seq[String])] = Seq(
    "Database" -> Seq("sql", "mysql", "postgresql", "oracle", "nosql", "mongodb", "database", "ms access", "sqlite", "redshift", "snowflake", "microsoft sql server", "teradata", "clickhouse", "azure sql database", "azure sql managed instance", "mariadb", "ms sql", "sql i pl/sql", "oracle forms", "oracle apex", "oracle ebs", "oracle application framework (oaf)", "oracle erp cloud", "sql server", "mssqlserver", "azure sql", "pl/pgsql", "aas", "neteza", "singlestore", "oracle fusion middleware", "oracle jdeveloper"),
    "Microsoft BI & Excel" -> Seq("excel", "power query", "power pivot", "vba", "macros", "pivot tables", "excel formulas", "spreadsheets", "m code", "ssrs", "ssis", "ssas", "power apps", "power automate", "powerpoint", "office 365", "microsoft power bi", "power bi", "power bi.", "ms office", "ms excel", "microsoft dynamics 365", "ms fabric"),
    "Visualization" -> Seq("tableau", "qlik", "looker", "data studio", "powerbi", "dax", "matplotlib", "seaborn", "plotly", "excel charts", "dashboard", "reporting", "d3.js", "grafana", "kibana", "google charts", "quicksight", "sas viya", "di studio", "eg", "sas studio", "visual analytics", "qliksense", "sas va", "qgis", "visio"),
    "Programming" -> Seq("python", "r", "java", "scala", "c#", ".net", "javascript", "typescript", "pandas", "numpy", "jupyter", "scikit-learn", "tidyverse", "julia", "sql scripting", "pl/sql", "t-sql", "linux", "windows", "unix", "windows server", "macos", "shell", "perl", "pyspark", "go", "rust", "c++", "c", "jee", "scala 3", "next.js", "fastapi", "rest", "spring framework", "css", "html", "u-boot", "yocto", "sas4gl", "mql5", "xml", "uml", "bpmn", "golang", "graphql", "spring boot", "hibernate", "flask api", "pytest", "junit", "liquibase", "angular", "vue.js", "ngrx", "swagger"),
    "Data Processing" -> Seq("etl", "spark", "hadoop", "kafka", "airflow", "data engineering", "big data", "data cleansing", "data transformation", "data modeling", "data warehouse", "databricks", "dbt", "talend", "informatica", "apache spark", "starrocks", "iceberg", "bigquery", "matillion", "data built tool", "apache airflow", "data lake", "adf", "azure data factory", "azure data lake", "parquet", "dwh", "elt/elt", "apache kafka", "alteryx", "azure databricks", "synapse analytics", "informatica cloud"),
    "Analytics & Statistics" -> Seq("statistics", "regression", "forecasting", "analytics", "analysis", "spss", "sas", "stata", "hypothesis testing", "a/b testing", "statistical", "time series", "clustering", "segmentation", "correlation", "adobe analytics", "google analytics", "sas di", "sas eg", "sas 4gl", "sas macro language", "data science", "data analytics"),
    "Cloud" -> Seq("aws", "azure", "gcp", "google cloud", "cloud", "onedrive", "sharepoint", "snowflake", "lambda", "s3", "pub/sub", "dataflow", "terraform", "google cloud services (big query)", "microsoft azure", "snowflake data cloud", "google cloud platform", "sap datasphere", "azure synapse", "azure functions", "azure repos", "microsoft  azure", "redis", "azure event hub", "ansible", "terragrunt", "vertex ai", "sagemaker", "azure devops"),
    "Business Intelligence" -> Seq("business intelligence", "bi", "cognos", "business objects", "microstrategy", "olap", "data mart", "reporting", "kpi", "metrics", "domo", "sisense", "bi publisher", "mis"),
    "Machine Learning and AI" -> Seq("machine learning", "scikit-learn", "tensorflow", "keras", "pytorch", "deep learning", "xgboost", "lightgbm", "nlp", "computer vision", "anomaly detection", "feature engineering", "opencv", "langchain", "pydantic", "langgraph", "hugging face ml tools", "mlops", "dagster", "llm", "ai", "ml", "transformers", "openai api", "tensorrt", "seldon", "onnx", "cap’n proto", "llamaindex", "mlflow", "kubeflow", "vllm", "pinecone", "faiss", "chroma", "llm/nlp", "sciklit-learn", "palantir foundry"),
    "Data Governance and Quality" -> Seq("data governance", "data quality", "data integrity", "data validation", "master data management", "metadata", "data lineage", "data catalog", "atlan", "collibra", "cdi", "cai", "cdgc"),
    "Data Privacy and Security" -> Seq("data privacy", "gdpr", "data security", "compliance", "pii", "data anonymization"),
    "Project Management and Soft Skills" -> Seq("project management", "agile", "scrum", "communication", "presentation", "storytelling", "collaboration", "stakeholder management", "requirements gathering", "jira", "confluence", "agile methodologies", "servicenow", "bugzilla", "otrs"),
    "Version Control" -> Seq("git", "github", "gitlab", "bitbucket", "svn"),
    "Data Integration and APIs" -> Seq("api", "rest api", "data integration", "web scraping", "etl tools", "soap", "ip rotation services", "google python apis", "rest apis", "soapui", "oracle service bus", "oracle soa"),
    "ERP and CRM Systems" -> Seq("sap", "oracle", "salesforce", "dynamics", "erp", "crm", "workday"),
    "DevOps" -> Seq("jenkins", "openshift", "docker", "kubernetes", "bamboo", "ci/cd", "maven", "gradle", "sonarqube", "argocd", "jenkins / ansible", "controlm", "liquiibase", "sonar"),
  )

  /** variation → canonical skill, flattened from the reference's
    * canonical → [variations] dict (identity rows included, as in the
    * reference — distinct() downstream collapses them). */
  val variations: Seq[(String, String)] = Seq(
    "sql" -> "sql",
    "structured query language" -> "sql",
    "sql server" -> "sql",
    "t-sql" -> "sql",
    "python" -> "python",
    "język python" -> "python",
    "power bi" -> "power bi",
    "powerbi" -> "power bi",
    "power-bi" -> "power bi",
    "excel" -> "excel",
    "microsoft excel" -> "excel",
    "ms excel" -> "excel",
    "tableau" -> "tableau",
    "java" -> "java",
    "javascript" -> "javascript",
    "js" -> "javascript",
    "azure" -> "azure",
    "microsoft azure" -> "azure",
    "aws" -> "aws",
    "amazon web services" -> "aws",
  )

  /** (term, category, priority) rows; priority = category insertion index
    * — min_by(category, priority) reproduces first-match-wins. */
  val taxonomyRows: Seq[(String, String, Int)] =
    categories.zipWithIndex.flatMap { case ((cat, terms), i) =>
      terms.map(t => (t, cat, i))
    }

  val allTerms: Seq[String] = taxonomyRows.map(_._1).distinct
}
