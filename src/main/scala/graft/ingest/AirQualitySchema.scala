package graft.ingest

/** The reference pipeline's expected input contract: 19 exact column names
  * (/root/reference/src/main.rs:90-110) and the 8-column projection kept by
  * `column_filter` (main.rs:137-146). The three typos are load-bearing —
  * matching is exact-string in the reference.
  */
object AirQualitySchema {
  val expectedColumns: Seq[String] = Seq(
    "Date", "NO2", "O3", "PM10", "PM2.5",
    "Latitude", "Longitude", "station_name",
    "Wind-Speed (U)", "Wind-Speed (V)",
    "Dewpoint Temp", "Soil Temp", "Total Percipitation",
    "Vegitation (High)", "Vegitation (Low)",
    "Temp", "Relative Humidity", "code", "id")

  /** Columns kept by the projection (pollutants + geo; main.rs:137-146). */
  val projectedColumns: Seq[String] = Seq(
    "Date", "NO2", "O3", "PM10", "PM2.5",
    "Latitude", "Longitude", "station_name")
}
