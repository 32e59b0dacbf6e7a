interface Props {
  onChooseFile: () => void;
  onChooseUrl: () => void;
}

export default function MainMenu({ onChooseFile, onChooseUrl }: Props) {
  return (
    <section className="menu">
      <button className="menu-card" onClick={onChooseFile}>
        <h3>Upload a file</h3>
        <p>.wav or .mp3, up to 25 MB</p>
      </button>
      <button className="menu-card" onClick={onChooseUrl}>
        <h3>From a URL</h3>
        <p>Direct audio links or Google Drive</p>
      </button>
    </section>
  );
}
