package graft.ts

/** Exception hierarchy mirroring the reference's
  * `/root/reference/tsod/custom_exceptions.py:1-38` message texts.
  */
class TsodSparkException(message: String) extends RuntimeException(message)

class WrongInputDataTypeError(
    message: String = "Input data must be a DataFrame with the configured time-series columns.")
  extends TsodSparkException(message)

class NotFittedError(
    message: String = "Please call fit() before detect().", tip: String = "")
  extends TsodSparkException(Seq(message, tip).filter(_.nonEmpty).mkString(" "))

class InvalidArgumentError(argumentName: String, requirement: String)
  extends TsodSparkException(s"$argumentName must be $requirement.")

class NotIntegerError(argumentName: String)
  extends InvalidArgumentError(argumentName, "an integer")

class NonUniqueTimeStampsError(
    message: String = "Found multiple values at the same time stamp.")
  extends TsodSparkException(message)
