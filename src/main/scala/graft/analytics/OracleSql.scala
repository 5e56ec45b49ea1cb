package graft.analytics

/** DuckDB oracle SQL for every entry in [[Queries.all]].
  *
  * The driver registers the raw parquet tables (`lineitem`, `orders`, ...)
  * and hash-compares each query's Spark result against these statements, so
  * each statement re-derives the warehouse from the raw tables via a shared
  * CTE prelude that is the *semantic spec* of
  * [[graft.warehouse.Warehouse.build]] — any drift between the two is a bug.
  *
  * Parity rules applied throughout (see GraftFunctions / SURVEY §7.4):
  *  - rounding is the explicit `FLOOR(x * 100 + 0.5) / 100.0` on both engines;
  *  - DuckDB `SUM(BIGINT)` returns HUGEINT → always cast `::BIGINT` to match
  *    Spark's LongType;
  *  - DuckDB date-part functions return BIGINT → cast `::INT` to match
  *    Spark's IntegerType;
  *  - day_of_week is ISO via `isodow` (Spark: `weekday()+1`);
  *  - every ORDER BY is total (tiebreakers on group keys).
  */
object OracleSql {

  /** Warehouse derivation — twin of `Warehouse.build`. Unreferenced CTEs are
    * not evaluated by DuckDB, so sharing one prelude across queries is free.
    */
  val prelude: String = """WITH
dim_patient AS (
  SELECT c_custkey AS patient_key, c_custkey AS patient_id,
         CASE WHEN c_acctbal < 0 THEN 'Unknown'
              WHEN c_acctbal < 2500 THEN '18-30'
              WHEN c_acctbal < 5000 THEN '31-50'
              WHEN c_acctbal < 7500 THEN '51-70'
              ELSE '71+' END AS age_group,
         c_mktsegment AS sex, n_name AS location
  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey),
dim_facility AS (
  SELECT n_nationkey AS facility_key, n_name AS facility_name,
         r_name AS facility_type, r_name AS location
  FROM nation JOIN region ON n_regionkey = r_regionkey),
dim_procedure AS (
  SELECT p_partkey AS procedure_key, p_name AS procedure_name,
         p_type AS modality, p_brand AS projection FROM part),
dim_diagnosis AS (
  SELECT p_partkey AS diagnosis_key, p_brand AS code,
         'Diagnosis ' || p_brand AS description, 'TPCH' AS code_system
  FROM part),
dim_time AS (
  SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
         CAST(d AS DATE) AS full_date,
         year(d)::INT AS year, quarter(d)::INT AS quarter,
         month(d)::INT AS month, monthname(d) AS month_name,
         week(d)::INT AS week, day(d)::INT AS day_of_month,
         isodow(d)::INT AS day_of_week, dayname(d) AS day_name,
         isodow(d) >= 6 AS is_weekend
  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
        FROM (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
                     max(CAST(o_orderdate AS DATE)) AS hi FROM orders))),
bridge_encounter_procedure AS (
  SELECT l_orderkey AS encounter_key, l_partkey AS procedure_key,
         min(l_shipdate) AS procedure_date
  FROM lineitem GROUP BY 1, 2),
bridge_encounter_diagnosis AS (
  SELECT l_orderkey AS encounter_key, l_partkey AS diagnosis_key,
         min(l_linenumber) = 1 AS is_primary,
         CAST(min(l_shipdate) AS DATE) AS diagnosis_date
  FROM lineitem GROUP BY 1, 2),
fact_encounters AS (
  SELECT o_orderkey AS encounter_key, o_orderkey AS encounter_id,
         o_custkey AS patient_key, c_nationkey AS facility_key,
         CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key,
         CAST(o_orderdate AS DATE) AS encounter_date,
         o_orderstatus AS encounter_type,
         COALESCE(np.n, 0) AS num_procedures,
         COALESCE(nd.n, 0) AS num_diagnoses,
         d.doc_id IS NOT NULL AS has_report
  FROM orders
  LEFT JOIN customer ON o_custkey = c_custkey
  LEFT JOIN (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1) np
    ON np.l_orderkey = o_orderkey
  LEFT JOIN (SELECT encounter_key, count(*) AS n
             FROM bridge_encounter_diagnosis GROUP BY 1) nd
    ON nd.encounter_key = o_orderkey
  LEFT JOIN (SELECT DISTINCT doc_id FROM documents) d ON d.doc_id = o_orderkey),
mv_monthly_encounters AS (
  SELECT dt.year, dt.month, dt.month_name,
         COUNT(DISTINCT fe.encounter_id) AS total_encounters,
         COUNT(DISTINCT fe.patient_key) AS unique_patients,
         AVG(fe.num_procedures) AS avg_procedures_per_encounter,
         SUM(fe.num_procedures)::BIGINT AS total_procedures
  FROM fact_encounters fe JOIN dim_time dt ON fe.date_key = dt.date_key
  GROUP BY dt.year, dt.month, dt.month_name),
mv_diagnosis_by_age_group AS (
  SELECT dp.age_group, dd.code, dd.description,
         COUNT(*) AS diagnosis_count,
         COUNT(DISTINCT fe.patient_key) AS unique_patients
  FROM bridge_encounter_diagnosis bed
  JOIN fact_encounters fe ON bed.encounter_key = fe.encounter_key
  JOIN dim_patient dp ON fe.patient_key = dp.patient_key
  JOIN dim_diagnosis dd ON bed.diagnosis_key = dd.diagnosis_key
  GROUP BY dp.age_group, dd.code, dd.description),
mv_procedure_volume AS (
  SELECT dpr.modality, COUNT(*) AS procedure_count,
         COUNT(DISTINCT fe.patient_key) AS unique_patients,
         COUNT(DISTINCT fe.facility_key) AS facilities_performed
  FROM bridge_encounter_procedure bep
  JOIN fact_encounters fe ON bep.encounter_key = fe.encounter_key
  JOIN dim_procedure dpr ON bep.procedure_key = dpr.procedure_key
  GROUP BY dpr.modality)
"""

  private def r2(x: String): String = s"FLOOR(($x) * 100 + 0.5) / 100.0"

  val all: Map[String, String] = Map(
    "q01_monthly_trends" -> s"""$prelude
SELECT year, month_name, total_encounters, unique_patients,
       ${r2("avg_procedures_per_encounter")} AS avg_procedures,
       total_procedures
FROM mv_monthly_encounters
ORDER BY year DESC, month DESC
LIMIT 12""",

    "q02_top_diagnoses_by_age_group" -> s"""$prelude,
ranked_diagnoses AS (
  SELECT age_group, code, description, diagnosis_count, unique_patients,
         ROW_NUMBER() OVER (PARTITION BY age_group
           ORDER BY diagnosis_count DESC, code, description) AS rnk
  FROM mv_diagnosis_by_age_group)
SELECT age_group, code, description, diagnosis_count, unique_patients
FROM ranked_diagnoses
WHERE rnk <= 5
ORDER BY age_group, rnk""",

    "q03_procedure_volume" -> s"""$prelude
SELECT modality, procedure_count, unique_patients, facilities_performed,
       ${r2("procedure_count * 1.0 / unique_patients")} AS procedures_per_patient
FROM mv_procedure_volume
ORDER BY procedure_count DESC, modality""",

    "q04_patient_utilization" -> s"""$prelude
SELECT COUNT(DISTINCT patient_key) AS total_patients,
       COUNT(DISTINCT encounter_key) AS total_encounters,
       ${r2("AVG(num_procedures)")} AS avg_procedures_per_encounter,
       ${r2("AVG(num_diagnoses)")} AS avg_diagnoses_per_encounter,
       ${r2("COUNT(DISTINCT encounter_key) * 1.0 / COUNT(DISTINCT patient_key)")}
         AS avg_encounters_per_patient
FROM fact_encounters""",

    "q05_weekend_vs_weekday" -> s"""$prelude
SELECT dt.is_weekend,
       CASE WHEN dt.is_weekend THEN 'Weekend' ELSE 'Weekday' END AS day_type,
       COUNT(DISTINCT fe.encounter_key) AS total_encounters,
       AVG(fe.num_procedures) AS avg_procedures,
       COUNT(DISTINCT fe.patient_key) AS unique_patients
FROM fact_encounters fe JOIN dim_time dt ON fe.date_key = dt.date_key
GROUP BY dt.is_weekend
ORDER BY dt.is_weekend""",

    "q06_demographics" -> s"""$prelude
SELECT age_group, sex, COUNT(*) AS patient_count,
       ${r2("COUNT(*) * 100.0 / (SUM(COUNT(*)) OVER ())")} AS percentage
FROM dim_patient
GROUP BY age_group, sex
ORDER BY age_group, sex""",

    "q07_facility_performance" -> s"""$prelude
SELECT df.facility_name, df.facility_type,
       COUNT(DISTINCT fe.encounter_key) AS total_encounters,
       COUNT(DISTINCT fe.patient_key) AS unique_patients,
       SUM(fe.num_procedures)::BIGINT AS total_procedures,
       ${r2("AVG(fe.num_procedures)")} AS avg_procedures_per_encounter
FROM fact_encounters fe
JOIN dim_facility df ON fe.facility_key = df.facility_key
GROUP BY df.facility_name, df.facility_type
ORDER BY total_encounters DESC, df.facility_name""",

    "q08_high_utilization" -> s"""$prelude
SELECT dp.patient_key, dp.age_group, dp.sex,
       COUNT(DISTINCT fe.encounter_key) AS encounter_count,
       SUM(fe.num_procedures)::BIGINT AS total_procedures,
       COUNT(DISTINCT CASE WHEN fe.has_report THEN fe.encounter_key END)
         AS encounters_with_reports
FROM fact_encounters fe
JOIN dim_patient dp ON fe.patient_key = dp.patient_key
GROUP BY dp.patient_key, dp.age_group, dp.sex
HAVING COUNT(DISTINCT fe.encounter_key) >= 5
ORDER BY encounter_count DESC, dp.patient_key
LIMIT 20""",

    // run_analytics.py report variants (reference src/run_analytics.py:53-60,
    // :134-143, :148-162) — same plans at different k / column sets.
    "q02_top3_report" -> s"""$prelude,
ranked_diagnoses AS (
  SELECT age_group, code, description, diagnosis_count,
         ROW_NUMBER() OVER (PARTITION BY age_group
           ORDER BY diagnosis_count DESC, code, description) AS rnk
  FROM mv_diagnosis_by_age_group)
SELECT age_group, code, description, diagnosis_count
FROM ranked_diagnoses
WHERE rnk <= 3
ORDER BY age_group, rnk""",

    "q07_top5_report" -> s"""$prelude
SELECT df.facility_name, df.facility_type,
       COUNT(DISTINCT fe.encounter_key) AS total_encounters,
       SUM(fe.num_procedures)::BIGINT AS total_procedures
FROM fact_encounters fe
JOIN dim_facility df ON fe.facility_key = df.facility_key
GROUP BY df.facility_name, df.facility_type
ORDER BY total_encounters DESC, df.facility_name, df.facility_type
LIMIT 5""",

    "q08_top10_report" -> s"""$prelude
SELECT dp.age_group, dp.sex,
       COUNT(DISTINCT fe.encounter_key) AS encounter_count,
       SUM(fe.num_procedures)::BIGINT AS total_procedures
FROM fact_encounters fe
JOIN dim_patient dp ON fe.patient_key = dp.patient_key
GROUP BY dp.patient_key, dp.age_group, dp.sex
HAVING COUNT(DISTINCT fe.encounter_key) >= 5
ORDER BY encounter_count DESC, dp.patient_key
LIMIT 10""",

    "q09_diagnosis_cooccurrence" -> s"""$prelude
SELECT d1.code AS diagnosis_1, d1.description AS description_1,
       d2.code AS diagnosis_2, d2.description AS description_2,
       COUNT(*) AS co_occurrence_count
FROM bridge_encounter_diagnosis bed1
JOIN bridge_encounter_diagnosis bed2
  ON bed1.encounter_key = bed2.encounter_key
 AND bed1.diagnosis_key < bed2.diagnosis_key
JOIN dim_diagnosis d1 ON bed1.diagnosis_key = d1.diagnosis_key
JOIN dim_diagnosis d2 ON bed2.diagnosis_key = d2.diagnosis_key
GROUP BY d1.code, d1.description, d2.code, d2.description
HAVING COUNT(*) >= 10
ORDER BY co_occurrence_count DESC, diagnosis_1, diagnosis_2
LIMIT 10""",

    "q10_quarterly_growth" -> s"""$prelude,
by_quarter AS (
  SELECT dt.year, dt.quarter,
         COUNT(DISTINCT fe.encounter_key) AS encounters,
         COUNT(DISTINCT fe.patient_key) AS unique_patients,
         SUM(fe.num_procedures)::BIGINT AS total_procedures
  FROM fact_encounters fe JOIN dim_time dt ON fe.date_key = dt.date_key
  GROUP BY dt.year, dt.quarter),
with_lag AS (
  SELECT *, LAG(encounters) OVER (ORDER BY year, quarter)
              AS previous_quarter_encounters
  FROM by_quarter)
SELECT year, quarter, encounters, unique_patients, total_procedures,
       previous_quarter_encounters,
       ${r2("(encounters - previous_quarter_encounters) * 100.0 / NULLIF(previous_quarter_encounters, 0)")}
         AS growth_percentage
FROM with_lag
ORDER BY year DESC, quarter DESC""",

    "q11_reports_coverage" -> s"""$prelude
SELECT year, month_name, total_encounters, encounters_with_reports,
       ${r2("encounters_with_reports * 100.0 / total_encounters")}
         AS report_completion_rate
FROM (
  SELECT dt.year, dt.month_name, dt.month,
         COUNT(*) AS total_encounters,
         SUM(CASE WHEN fe.has_report THEN 1 ELSE 0 END)::BIGINT
           AS encounters_with_reports
  FROM fact_encounters fe JOIN dim_time dt ON fe.date_key = dt.date_key
  GROUP BY dt.year, dt.month_name, dt.month
  ORDER BY dt.year DESC, dt.month DESC
  LIMIT 12)
ORDER BY year DESC, month DESC""",

    "q12_encounter_types" -> s"""$prelude
SELECT encounter_type, COUNT(*) AS encounter_count,
       COUNT(DISTINCT patient_key) AS unique_patients,
       ${r2("AVG(num_procedures)")} AS avg_procedures,
       ${r2("AVG(num_diagnoses)")} AS avg_diagnoses,
       SUM(CASE WHEN has_report THEN 1 ELSE 0 END)::BIGINT
         AS encounters_with_reports
FROM fact_encounters
GROUP BY encounter_type
ORDER BY encounter_count DESC, encounter_type""",

    "mv_monthly_encounters" -> s"""$prelude
SELECT year, month, month_name, total_encounters, unique_patients,
       avg_procedures_per_encounter, total_procedures
FROM mv_monthly_encounters
ORDER BY year, month""",

    "mv_diagnosis_by_age_group" -> s"""$prelude
SELECT age_group, code, description, diagnosis_count, unique_patients
FROM mv_diagnosis_by_age_group
ORDER BY age_group, diagnosis_count DESC, code, description""",

    "mv_procedure_volume" -> s"""$prelude
SELECT modality, procedure_count, unique_patients, facilities_performed
FROM mv_procedure_volume
ORDER BY procedure_count DESC, modality""",

    "readme_q1_monthly" -> s"""$prelude
SELECT year, month, month_name, total_encounters, unique_patients
FROM mv_monthly_encounters
ORDER BY year DESC, month DESC""",

    "readme_q2_top_diagnoses_51_70" -> s"""$prelude
SELECT age_group, code, description, diagnosis_count
FROM mv_diagnosis_by_age_group
WHERE age_group = '51-70'
ORDER BY diagnosis_count DESC, code, description
LIMIT 10""",

    "readme_q3_avg_procedures" -> s"""$prelude
SELECT COUNT(DISTINCT patient_key) AS total_patients,
       ${r2("AVG(num_procedures)")} AS avg_procedures_per_encounter
FROM fact_encounters""",

    "readme_q4_high_volume" -> s"""$prelude
SELECT dp.patient_key, dp.age_group, COUNT(*) AS total_visits
FROM fact_encounters fe
JOIN dim_patient dp ON fe.patient_key = dp.patient_key
GROUP BY dp.patient_key, dp.age_group
HAVING COUNT(*) >= 5
ORDER BY total_visits DESC, dp.patient_key""",

    "readme_age_distribution" -> s"""$prelude
SELECT age_group, COUNT(DISTINCT patient_key) AS patient_count
FROM dim_patient
GROUP BY age_group
ORDER BY age_group""",

    "readme_record_counts" -> s"""$prelude
SELECT * FROM (
  SELECT 'patients' AS table_name, COUNT(*) AS record_count FROM dim_patient
  UNION ALL
  SELECT 'encounters', COUNT(*) FROM fact_encounters
  UNION ALL
  SELECT 'procedures', COUNT(*) FROM bridge_encounter_procedure
  UNION ALL
  SELECT 'diagnoses', COUNT(*) FROM bridge_encounter_diagnosis)
ORDER BY table_name""")
}
