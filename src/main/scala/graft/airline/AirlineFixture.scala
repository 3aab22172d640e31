package graft.airline

import java.io.{File, PrintWriter}

/** Deterministic airline-shaped CSV segment generator — the stream
  * fixture for tests and the streaming bench (the reference's own Kaggle
  * dataset is not shipped; its 24-column schema is reconstructed in
  * Tables.airlineSchema from the reference's explicit StructType,
  * reference: src/main/scala/Consumer.scala:22-46). */
object AirlineFixture {

  private val genders = Seq("Male", "Female")
  private val ctypes = Seq("Loyal Customer", "disloyal Customer")
  private val travel = Seq("Business travel", "Personal Travel")
  private val classes = Seq("Business", "Eco", "Eco Plus")
  private val sats = Seq("satisfied", "neutral or dissatisfied")

  val header: String = {
    val r = Seq("Inflight wifi service", "Departure/Arrival time convenient",
      "Ease of Online booking", "Gate location", "Food and drink", "Online boarding",
      "Seat comfort", "Inflight entertainment", "On-board service", "Leg room service",
      "Baggage handling", "Checkin service", "Inflight service", "Cleanliness")
    (Seq("id", "Gender", "Customer Type", "Age", "Type of Travel", "Class",
      "Flight Distance") ++ r ++
      Seq("Departure Delay in Minutes", "Arrival Delay in Minutes", "satisfaction"))
      .mkString(",")
  }

  def csvLine(i: Int): String = {
    val rnd = new scala.util.Random(i)
    val ratings = Seq.fill(14)(rnd.nextInt(6)).mkString(",")
    s"$i,${genders(i % 2)},${ctypes(i % 3 % 2)},${20 + i % 40},${travel(i % 5 % 2)}," +
      s"${classes(i % 3)},${500 + i % 3000},$ratings,${i % 30},${(i % 25).toDouble},${sats(i % 4 % 2)}"
  }

  /** Write `nSegments` directories of `rowsPerSegment` rows each. */
  def writeSegments(dir: String, nSegments: Int, rowsPerSegment: Int): Unit =
    (0 until nSegments).foreach { s =>
      new File(s"$dir/segment_$s").mkdirs()
      val w = new PrintWriter(s"$dir/segment_$s/part-0.csv")
      try {
        w.println(header)
        (0 until rowsPerSegment).foreach(i => w.println(csvLine(s * rowsPerSegment + i)))
      } finally w.close()
    }
}
