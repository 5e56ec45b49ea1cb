package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's three materialized views (`sql/03_warehouse.sql:112-156`)
  * as pre-aggregated DataFrames (A10). A matview in Spark terms is a
  * persisted aggregate: compute once, reuse across queries, recompute to
  * refresh — `Warehouse` exposes them as lazy vals so Q1-Q3 reuse one plan.
  *
  * All three are classic star aggregations: broadcast the dimension, shuffle
  * only the fact/bridge side, partial-aggregate map-side. At 100 TB the
  * matviews would be written back as parquet tables partitioned by their
  * leading group key and rebuilt incrementally per date partition.
  */
object MatViews {

  /** mv_monthly_encounters (`sql/03_warehouse.sql:112-124`). */
  def monthlyEncounters(wh: Warehouse): DataFrame =
    wh.factEncounters
      .join(broadcast(wh.dimTime), "date_key")
      .groupBy(col("year"), col("month"), col("month_name"))
      .agg(
        countDistinct(col("encounter_id")).as("total_encounters"),
        countDistinct(col("patient_key")).as("unique_patients"),
        avg(col("num_procedures")).as("avg_procedures_per_encounter"),
        sum(col("num_procedures")).as("total_procedures"))

  /** mv_diagnosis_by_age_group (`sql/03_warehouse.sql:129-141`) — the 4-way
    * star join J3: bridge ⋈ fact ⋈ dim_patient ⋈ dim_diagnosis.
    */
  def diagnosisByAgeGroup(wh: Warehouse): DataFrame =
    wh.bridgeDiagnosis
      .join(wh.factEncounters.select(col("encounter_key"), col("patient_key")),
        "encounter_key")
      .join(broadcast(wh.dimPatient.select(col("patient_key"), col("age_group"))),
        "patient_key")
      .join(broadcast(wh.dimDiagnosis.select(col("diagnosis_key"), col("code"),
        col("description"))), "diagnosis_key")
      .groupBy(col("age_group"), col("code"), col("description"))
      .agg(
        count(lit(1)).as("diagnosis_count"),
        countDistinct(col("patient_key")).as("unique_patients"))

  /** mv_procedure_volume (`sql/03_warehouse.sql:146-156`). */
  def procedureVolume(wh: Warehouse): DataFrame =
    wh.bridgeProcedure
      .join(wh.factEncounters.select(col("encounter_key"), col("patient_key"),
        col("facility_key")), "encounter_key")
      .join(broadcast(wh.dimProcedure.select(col("procedure_key"), col("modality"))),
        "procedure_key")
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("procedure_count"),
        countDistinct(col("patient_key")).as("unique_patients"),
        countDistinct(col("facility_key")).as("facilities_performed"))
}
