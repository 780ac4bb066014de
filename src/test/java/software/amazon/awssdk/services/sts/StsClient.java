package software.amazon.awssdk.services.sts;

/** Signature-contract stub for the engine's reflective STS binding. */
public class StsClient {
  private StsClient() {}
  public static StsClient create() { return new StsClient(); }
}
